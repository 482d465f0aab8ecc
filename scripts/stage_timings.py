#!/usr/bin/env python
"""Per-stage timings of the train step on the bench scene (one chip).

Each stage is timed with the tunnel-safe protocol (see bench.py): N
iterations chained inside ONE jitted `lax.fori_loop`, every iteration
consuming a scalar produced by the previous (defeats overlap), one host
transfer at the end. Stages nest (geometry ⊂ fwd ⊂ fwd+bwd ⊂ full step), so
differences between rows locate the cost.

Usage: python scripts/stage_timings.py [--iters 100]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatars_tpu.models.flame.assets import bootstrap_template_env

bootstrap_template_env()

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="measure the bf16 mixed-precision policy "
                        "(OptimizationConfig.use_amp) in the full-step row")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import TILE, build_scene
    from gaussianavatars_tpu.config import Config, ModelConfig, PipelineConfig
    from gaussianavatars_tpu.models.binding import face_frames
    from gaussianavatars_tpu.models.gaussians import world_gaussians
    from gaussianavatars_tpu.ops.projection import project_from_params
    from gaussianavatars_tpu.ops.rasterize_tiled import (
        bin_gaussians, rasterize_binned, render_tiled,
    )
    from gaussianavatars_tpu.ops.sh import eval_sh_color_kc
    from gaussianavatars_tpu.training.loss import ssim
    from gaussianavatars_tpu.training.trainer import init_train_state, make_train_step

    model, params, aux, fl, cam, n = build_scene()
    use_pallas = jax.default_backend() == "tpu" and not a.no_pallas
    print(f"device={jax.devices()[0]} n={n} pallas={use_pallas}", file=sys.stderr)
    W, H = cam.width, cam.height
    bg = jnp.zeros(3)

    def timed(name, body, n_iter=a.iters):
        """body: (scalar) -> scalar with a data dependency both ways."""
        @jax.jit
        def run(s):
            return jax.lax.fori_loop(0, n_iter, lambda i, c: body(c), s)

        s = run(jnp.zeros(()))
        float(s)  # compile + warm
        t0 = time.perf_counter()
        float(run(jnp.zeros(())))
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:34s} {dt * 1e3:8.3f} ms")
        return dt

    def geometry(s):
        jaw = jnp.zeros((1, 3)) + s * 1e-12
        verts = model.forward(fl._replace(jaw=jaw))
        frames = face_frames(verts[0], model.faces)
        wg = world_gaussians(params, aux, frames)
        proj = project_from_params(wg.means, wg.scales, wg.quats, cam, alive=wg.alive)
        dirs = wg.means - cam.camera_center
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        colors = eval_sh_color_kc(wg.sh, dirs, 3)
        return proj, colors, wg

    timed("geometry (FLAME+proj+SH)", lambda s: s + geometry(s)[0].mean2d[0, 0] * 0)

    def with_binning(s, tight, tcfg=TILE):
        proj, colors, wg = geometry(s)
        proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)
        opac = jnp.where(proj_sg.mask, wg.opacity, 0.0) if tight else None
        binned = bin_gaussians(proj_sg, H, W, tcfg, pallas_table=use_pallas,
                               opacity=opac)
        return s + binned.idx[0, 0].astype(jnp.float32) * 0 + proj.mean2d[0, 0] * 0

    timed("geometry + binning (loose)", lambda s: with_binning(s, False))
    timed("geometry + binning (tight)", lambda s: with_binning(s, True))
    # Pair-sort volume reduction: only the 8192 largest-footprint splats get
    # the full tile budget (TileConfig.big_slots).
    tile_2c = dataclasses.replace(TILE, big_slots=8192, small_budget=2)
    timed("geometry + binning (two-class)", lambda s: with_binning(s, True, tile_2c))

    def fwd(s):
        jaw = jnp.zeros((1, 3)) + s * 1e-12
        verts = model.forward(fl._replace(jaw=jaw))
        frames = face_frames(verts[0], model.faces)
        wg = world_gaussians(params, aux, frames)
        out = render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, cam, bg,
            sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE, use_pallas=use_pallas,
        )
        return out

    timed("render fwd", lambda s: s + fwd(s).color[0, 0, 0] * 0)

    # Composite-only rows: binning fixed (computed once outside the loop),
    # geometry recomputed per iteration so the compositor sees fresh inputs.
    def _setup_composite():
        proj, colors, wg = geometry(jnp.zeros(()))
        proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)
        opac = jnp.where(proj_sg.mask, wg.opacity, 0.0)
        binned = bin_gaussians(proj_sg, H, W, TILE, pallas_table=use_pallas,
                               opacity=jax.lax.stop_gradient(opac))
        if use_pallas:
            from gaussianavatars_tpu.ops.pallas.composite import make_pallas_compositor

            _nty, ntx = TILE.grid(H, W)
            comp = make_pallas_compositor(binned.counts, TILE.tile_h, TILE.tile_w, ntx)
        else:
            from gaussianavatars_tpu.ops.rasterize_tiled import composite_tiles
            comp = composite_tiles
        return binned, comp

    binned_fix, comp_fix = _setup_composite()
    binned_fix = jax.tree_util.tree_map(jax.lax.stop_gradient, binned_fix)

    def comp_fwd(s):
        proj, colors, wg = geometry(s)
        opac = jnp.where(proj.mask, wg.opacity, 0.0)
        img, alpha = rasterize_binned(
            proj.mean2d, proj.conic, colors, opac, binned_fix, H, W, bg, TILE,
            compositor=comp_fix,
        )
        return s + img[0, 0, 0] * 0

    timed("geometry + composite fwd", comp_fwd)

    def comp_fwd_bwd(s):
        def loss_fn(p):
            jaw = jnp.zeros((1, 3)) + s * 1e-12
            verts = model.forward(fl._replace(jaw=jaw))
            frames = face_frames(verts[0], model.faces)
            wg = world_gaussians(p, aux, frames)
            proj = project_from_params(wg.means, wg.scales, wg.quats, cam,
                                       alive=wg.alive)
            dirs = wg.means - cam.camera_center
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
            colors = eval_sh_color_kc(wg.sh, dirs, 3)
            opac = jnp.where(proj.mask, wg.opacity, 0.0)
            img, alpha = rasterize_binned(
                proj.mean2d, proj.conic, colors, opac, binned_fix, H, W, bg,
                TILE, compositor=comp_fix,
            )
            return jnp.mean(img)
        l, g = jax.value_and_grad(loss_fn)(params)
        return s + l * 0 + g.means[0, 0] * 0

    timed("geometry + composite fwd+bwd", comp_fwd_bwd)

    target = jax.jit(lambda: fwd(jnp.zeros(())).color)()

    def fwd_bwd_mse(s):
        def loss_fn(p):
            jaw = jnp.zeros((1, 3)) + s * 1e-12
            verts = model.forward(fl._replace(jaw=jaw))
            frames = face_frames(verts[0], model.faces)
            wg = world_gaussians(p, aux, frames)
            out = render_tiled(
                wg.means, wg.scales, wg.quats, wg.opacity, cam, bg,
                sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE,
                use_pallas=use_pallas,
            )
            return jnp.mean((out.color - target) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        return s + l * 0 + g.means[0, 0] * 0

    timed("render fwd+bwd (mse)", fwd_bwd_mse)

    def fwd_bwd_l1ssim(s):
        def loss_fn(p):
            jaw = jnp.zeros((1, 3)) + s * 1e-12
            verts = model.forward(fl._replace(jaw=jaw))
            frames = face_frames(verts[0], model.faces)
            wg = world_gaussians(p, aux, frames)
            out = render_tiled(
                wg.means, wg.scales, wg.quats, wg.opacity, cam, bg,
                sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE,
                use_pallas=use_pallas,
            )
            l1 = jnp.abs(out.color - target).mean()
            sv = 1.0 - ssim(jnp.transpose(out.color, (2, 0, 1)),
                            jnp.transpose(target, (2, 0, 1)))
            return 0.8 * l1 + 0.2 * sv
        l, g = jax.value_and_grad(loss_fn)(params)
        return s + l * 0 + g.means[0, 0] * 0

    timed("render fwd+bwd (L1+SSIM)", fwd_bwd_l1ssim)

    # Full train step (donated state; carry the loss scalar as dependency).
    from gaussianavatars_tpu.config import OptimizationConfig

    cfg = Config(
        model=ModelConfig(capacity=params.capacity, n_shape=100, n_expr=50),
        pipeline=PipelineConfig(
            tile_h=TILE.tile_h, tile_w=TILE.tile_w, use_pallas=use_pallas
        ),
        opt=OptimizationConfig(use_amp=a.amp),
    )
    state = init_train_state(
        params, aux, cfg, num_timesteps=2, n_expr=50, n_shape=100,
        num_verts=model.num_verts,
    )
    # The production dispatch: K steps per call via make_train_scan
    # (training/loop.py's chunked path), not a jitted-step-in-fori_loop.
    from gaussianavatars_tpu.data.cameras import jit_static_key
    from gaussianavatars_tpu.training.trainer import make_train_scan, stack_cameras

    scan_fn = make_train_scan(model, cfg, TILE)
    k = a.iters
    cache = (jnp.clip(target, 0, 1)[None] * 255).astype(jnp.uint8)  # [1,H,W,3]
    views = jnp.zeros((k,), jnp.int32)
    cams = stack_cameras([jit_static_key(cam)] * k)
    ts = jnp.zeros((k,), jnp.int32)

    st, m = scan_fn(state, cache, views, cams, ts, bg, sh_degree=3)
    float(m["loss"][-1])
    state2 = jax.tree_util.tree_map(jnp.array, st)  # fresh buffers (donated)
    t0 = time.perf_counter()
    st, m = scan_fn(state2, cache, views, cams, ts, bg, sh_degree=3)
    float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / k
    label = "full train step (scan chunk%s)" % (", amp" if a.amp else "")
    print(f"{label:34s} {dt * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
