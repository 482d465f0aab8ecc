#!/usr/bin/env python
"""A/B the compositing kernel implementations on the bench scene (one chip).

Times the forward and backward Pallas kernels IN ISOLATION (fixed sorted
table, chained-fori protocol — see bench.py measurement rules) for each
implementation pair, plus the end-to-end render/fwd+bwd rows. Used to pick
the production kernel; the loser is deleted.

Usage: python scripts/kernel_ab.py [--iters 100] [--impls v2,v3]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--impls", default="v2,v3")
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bench import HEIGHT, WIDTH, build_scene
    from gaussianavatars_tpu.models.binding import face_frames
    from gaussianavatars_tpu.models.gaussians import world_gaussians
    from gaussianavatars_tpu.ops import projection as proj_mod
    from gaussianavatars_tpu.ops.pallas import composite_pairs as cp
    from gaussianavatars_tpu.ops.rasterize_sorted import sort_gather
    from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig, render_tiled
    from gaussianavatars_tpu.ops.sh import eval_sh_color_kc
    from gaussianavatars_tpu.ops.sort_binning import bbox_tiles, probe_tiers

    assert jax.default_backend() == "tpu"
    model, params, aux, fl, cam, n = build_scene()
    H, W = cam.height, cam.width
    bg = jnp.zeros(3)

    verts0 = model.forward(fl)
    wg = world_gaussians(params, aux, face_frames(verts0[0], model.faces))
    proj = proj_mod.project_from_params(
        wg.means, wg.scales, wg.quats, cam, alive=wg.alive
    )
    dirs = wg.means - cam.camera_center
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    colors = eval_sh_color_kc(wg.sh, dirs, 3)
    opac = jnp.where(proj.mask, wg.opacity, 0.0)
    tminx, tminy, bw, ntiles, _, _ = bbox_tiles(proj, H, W, 32, 32, opacity=opac)
    fps0 = np.asarray(jnp.where(proj.mask, ntiles, 0))
    spec = probe_tiers(fps0)
    TILE = TileConfig(tile_h=32, tile_w=32, base_budget=spec.base, tiers=spec.tiers)
    nty, ntx = TILE.grid(H, W)
    nt = nty * ntx
    ntiles_eff = jnp.where(proj.mask, ntiles, 0)
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-20).astype(jnp.float32), jnp.int32
    )

    sg = jax.lax.stop_gradient
    dataT, plan = jax.jit(lambda: sort_gather(
        (nt, ntx, spec), proj.mean2d, proj.conic, colors, opac,
        (tminx, tminy, bw, ntiles_eff, depth_bits),
    ))()
    dataT = sg(dataT)
    plan = jax.tree_util.tree_map(sg, plan)
    p = TILE.tile_h * TILE.tile_w
    print(f"scene: {n} splats, {int(plan.total)} pairs, "
          f"max tile count {int(plan.counts.max())}", file=sys.stderr)

    def timed(name, body, n_iter=a.iters):
        @jax.jit
        def run(s):
            return jax.lax.fori_loop(0, n_iter, lambda i, c: body(c), s)

        float(run(jnp.zeros(())))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(jnp.zeros(())))
            best = min(best, (time.perf_counter() - t0) / n_iter)
        print(f"{name:34s} {best * 1e3:8.3f} ms")
        return best

    g_acc_t = jnp.asarray(np.random.RandomState(0).randn(nt, p, 3), jnp.float32)
    g_t = jnp.asarray(np.random.RandomState(1).randn(nt, p), jnp.float32)

    results = {}
    for impl in a.impls.split(","):
        cp._FWD_IMPL = getattr(cp, f"_fwd_kernel_pairs_{impl}")
        cp._BWD_IMPL = getattr(cp, f"_bwd_kernel_pairs_{impl}")

        def kern_fwd(s):
            d = dataT.at[0, 0].add(s * 1e-30)
            acc, tfin, stop = cp.fwd_call_pairs(
                d, plan.tile_starts, plan.counts, TILE.tile_h, TILE.tile_w, ntx
            )
            return s + acc[0, 0, 0] * 0 + tfin[0, 0] * 0

        acc, tfin, stop = jax.jit(lambda: cp.fwd_call_pairs(
            dataT, plan.tile_starts, plan.counts, TILE.tile_h, TILE.tile_w, ntx
        ))()

        def kern_bwd(s):
            d = dataT.at[0, 0].add(s * 1e-30)
            dg = cp.bwd_call_pairs(
                d, plan.tile_starts, plan.counts, acc, tfin, stop,
                g_acc_t, g_t, TILE.tile_h, TILE.tile_w, ntx,
            )
            return s + dg[0, 0] * 0

        def full_render(s):
            jaw = jnp.zeros((1, 3)) + s * 1e-9
            verts = model.forward(fl._replace(jaw=jaw))
            frames = face_frames(verts[0], model.faces)
            w2 = world_gaussians(params, aux, frames)
            out = render_tiled(
                w2.means, w2.scales, w2.quats, w2.opacity, cam, bg,
                sh=w2.sh, sh_degree=3, alive=w2.alive, cfg=TILE,
            )
            return s + out.color[0, 0, 0] * 0

        target = jax.jit(lambda: render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, cam, bg,
            sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE,
        ).color)()

        def fwd_bwd(s):
            def loss_fn(pr):
                jaw = jnp.zeros((1, 3)) + s * 1e-9
                verts = model.forward(fl._replace(jaw=jaw))
                frames = face_frames(verts[0], model.faces)
                w2 = world_gaussians(pr, aux, frames)
                out = render_tiled(
                    w2.means, w2.scales, w2.quats, w2.opacity, cam, bg,
                    sh=w2.sh, sh_degree=3, alive=w2.alive, cfg=TILE,
                )
                return jnp.mean((out.color - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            return s + loss * 0 + g.means[0, 0] * 0

        print(f"--- impl {impl} ---")
        r = {
            "kern_fwd_ms": timed(f"[{impl}] fwd kernel (fixed table)", kern_fwd) * 1e3,
            "kern_bwd_ms": timed(f"[{impl}] bwd kernel (fixed table)", kern_bwd) * 1e3,
            "render_ms": timed(f"[{impl}] full render", full_render) * 1e3,
            "fwd_bwd_ms": timed(f"[{impl}] render fwd+bwd (mse)", fwd_bwd) * 1e3,
        }
        results[impl] = r
    print(results)


if __name__ == "__main__":
    main()
