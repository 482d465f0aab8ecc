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

    # Production binning: the data-carrying sort (sort_gather forward).
    from gaussianavatars_tpu.ops.rasterize_sorted import (
        composite_sorted, sort_gather,
    )
    from gaussianavatars_tpu.ops.sort_binning import bbox_tiles

    spec = TILE.tier_spec(params.capacity)
    nty, ntx = TILE.grid(H, W)
    nt = nty * ntx

    def sorted_binning(s):
        proj, colors, wg = geometry(s)
        sg = jax.lax.stop_gradient
        proj_sg = jax.tree_util.tree_map(sg, proj)
        opac = jnp.where(proj_sg.mask, wg.opacity, 0.0)
        tminx, tminy, bw, ntiles, _, _ = bbox_tiles(
            proj_sg, H, W, TILE.tile_h, TILE.tile_w, opacity=sg(opac)
        )
        ntiles_eff = jnp.where(proj_sg.mask, ntiles, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj_sg.depth, 1e-20).astype(jnp.float32), jnp.int32
        )
        dataT, plan = sort_gather(
            (nt, ntx, spec), proj.mean2d, proj.conic, colors, opac,
            (tminx, tminy, bw, ntiles_eff, depth_bits),
        )
        return s + dataT[0, 0] * 0 + plan.counts[0].astype(jnp.float32) * 0

    timed("geometry + sorted binning", sorted_binning)

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

    # Kernel-in-isolation rows: the binned table fixed (computed once),
    # the Pallas compositors timed alone on it. These isolate the kernel
    # cost from binning/geometry — the rows the kernel work optimises.
    def _setup_table():
        proj, colors, wg = geometry(jnp.zeros(()))
        sg = jax.lax.stop_gradient
        proj_sg = jax.tree_util.tree_map(sg, proj)
        opac = jnp.where(proj_sg.mask, wg.opacity, 0.0)
        tminx, tminy, bw, ntiles, _, _ = bbox_tiles(
            proj_sg, H, W, TILE.tile_h, TILE.tile_w, opacity=sg(opac)
        )
        ntiles_eff = jnp.where(proj_sg.mask, ntiles, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj_sg.depth, 1e-20).astype(jnp.float32), jnp.int32
        )
        dataT, plan = sort_gather(
            (nt, ntx, spec), proj_sg.mean2d, proj_sg.conic, sg(colors), opac,
            (tminx, tminy, bw, ntiles_eff, depth_bits),
        )
        return jax.lax.stop_gradient(dataT), jax.tree_util.tree_map(
            jax.lax.stop_gradient, plan
        )

    dataT_fix, plan_fix = jax.jit(_setup_table)()

    from gaussianavatars_tpu.ops.pallas.composite_pairs import (
        bwd_call_pairs, fwd_call_pairs,
    )

    def kern_fwd(s):
        d = dataT_fix.at[0, 0].add(s * 1e-30)
        acc, tfin, stop = fwd_call_pairs(
            d, plan_fix.tile_starts, plan_fix.counts,
            TILE.tile_h, TILE.tile_w, ntx,
        )
        return s + acc[0, 0, 0] * 0 + tfin[0, 0] * 0

    timed("composite fwd kernel (fixed)", kern_fwd)

    _acc, _tfin, _stop = jax.jit(lambda: fwd_call_pairs(
        dataT_fix, plan_fix.tile_starts, plan_fix.counts,
        TILE.tile_h, TILE.tile_w, ntx,
    ))()
    import numpy as _np
    _p = TILE.tile_h * TILE.tile_w
    g_acc_t = jnp.asarray(_np.random.RandomState(0).randn(nt, _p, 3), jnp.float32)
    g_t = jnp.asarray(_np.random.RandomState(1).randn(nt, _p), jnp.float32)

    def kern_bwd(s):
        d = dataT_fix.at[0, 0].add(s * 1e-30)
        dg = bwd_call_pairs(
            d, plan_fix.tile_starts, plan_fix.counts, _acc, _tfin, _stop,
            g_acc_t, g_t, TILE.tile_h, TILE.tile_w, ntx,
        )
        return s + dg[0, 0] * 0

    timed("composite bwd kernel (fixed)", kern_bwd)

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
