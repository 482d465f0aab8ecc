"""Benchmark: avatar render FPS + fwd/bwd throughput on one chip.

Mirrors the reference FPS protocol (`fps_benchmark_demo.py:53-80`): a fixed
view at 802×550, 500 renders × 3 rounds, FLAME mesh update included in every
frame. The headline JSON line reports render FPS against the reference's 85
FPS baseline (`INNOVATIONS_5.md:16`, BASELINE.md). Extra metrics (fwd+bwd
iters/s, Mpix/s) go to stderr.

Scene: ~92k Gaussians (9 per FLAME face) with *trained-avatar-like*
statistics — splats hugging their triangles (small local jitter), scales a
fraction of the triangle, high opacity — matching the regime the reference's
85 FPS number was measured in (an optimized NeRSemble avatar).

Timing protocol: renders are chained inside ONE jitted `lax.fori_loop`
(each frame consumes a value from the previous), then a host transfer of the
final scalar blocks on the whole chain. This is the TPU-tunnel analogue of
CUDA-event timing: per-dispatch tunnel noise (~0.5 ms/call here) is excluded,
data dependencies prevent any overlap-cheating.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Prefer the real FLAME template topology when available.
from gaussianavatars_tpu.models.flame.assets import bootstrap_template_env  # noqa: E402

bootstrap_template_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaussianavatars_tpu.data.cameras import look_at_camera  # noqa: E402
from gaussianavatars_tpu.models.binding import face_frames  # noqa: E402
from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets  # noqa: E402
from gaussianavatars_tpu.models.flame.flame_model import zero_params  # noqa: E402
from gaussianavatars_tpu.models.gaussians import init_bound, world_gaussians, inverse_sigmoid  # noqa: E402
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig, render_tiled  # noqa: E402

WIDTH, HEIGHT = 802, 550
N_ITER = 500
N_ROUNDS = 3
BASELINE_FPS = 85.0  # reference: demo avatar, RTX-class GPU (INNOVATIONS_5.md:16)
# Pair-layout config (the production path): two-class expansion sized so the
# bench scene truncates NOTHING (probed: 15.6k splats need >4 tiles, max
# footprint 49 tiles, 315k live pairs). pair_cap bounds the sorted prefix the
# kernels/gathers touch; binning reports any overflow and the guard below
# asserts zero.
TILE = TileConfig(
    tile_h=32, tile_w=32, capacity=512,
    max_tiles_per_gaussian=64, big_slots=16384, small_budget=4,
    pair_cap=458752,
)


def build_scene(per_face=9, seed=0):
    key = jax.random.PRNGKey(seed)
    assets = synthetic_assets(n_shape=100, n_expr=50, seed=seed)
    model = FlameModel(assets, FlameConfig(n_shape=100, n_expr=50, add_teeth=True))
    n = model.num_faces * per_face
    # Pad to a 8192-multiple, not the next power of two: the padded capacity
    # multiplies every per-Gaussian cost (projection, the [N×B] pair sort),
    # and 131072 slots for 91k live splats would pay 43% sort padding.
    cap = -(-n // 8192) * 8192
    params, aux = init_bound(model.num_faces, capacity=cap, key=key, per_face=per_face)
    k1, k2, k3 = jax.random.split(key, 3)
    params = dataclasses.replace(
        params,
        # Trained-avatar statistics: splats near their triangle, sub-triangle
        # scales, high opacity (an optimized surface, not a point cloud).
        means=jax.random.normal(k1, params.means.shape) * 0.1,
        log_scales=jnp.log(
            jax.random.uniform(k2, params.log_scales.shape, minval=0.25, maxval=0.7)
        ),
        quats=jax.random.normal(k3, params.quats.shape),
        logit_opacity=jnp.full_like(params.logit_opacity, float(inverse_sigmoid(0.92))),
    )
    fl = zero_params(100, 50, batch=1)
    center = np.asarray(assets.v_template.mean(0))
    extent = float(np.abs(assets.v_template - center).max())
    cam = look_at_camera(
        eye=center + np.array([0.0, 0.0, -4.5 * extent]), target=center,
        fovy=0.4, width=WIDTH, height=HEIGHT,
    )
    return model, params, aux, fl, cam, n


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    model, params, aux, fl, cam, n_gauss = build_scene()
    print(f"scene: {n_gauss} Gaussians, {model.num_faces} faces", file=sys.stderr)
    use_pallas = jax.default_backend() == "tpu"

    def make_run_render(tile_cfg):
        def render_frame(carry, _i):
            _img, s = carry
            jaw = jnp.zeros((1, 3)) + s * 1e-9   # FLAME update every frame
            verts = model.forward(fl._replace(jaw=jaw))
            frames = face_frames(verts[0], model.faces)
            wg = world_gaussians(params, aux, frames)
            out = render_tiled(
                wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
                sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=tile_cfg,
                use_pallas=use_pallas,
            )
            return (out.color, s + out.color[0, 0, 0] * 0)

        @jax.jit
        def run_render(carry):
            return jax.lax.fori_loop(0, N_ITER, lambda i, c: render_frame(c, i), carry)

        return run_render

    run_render = make_run_render(TILE)

    # Guard: the pair binning must not truncate anything, or the headline FPS
    # is measured on partial frames. The pair layout has no per-tile capacity;
    # the only budgets are the per-Gaussian tile budget (two-class) and
    # pair_cap, both observable here.
    from gaussianavatars_tpu.ops.pairs import bin_pairs
    from gaussianavatars_tpu.ops.projection import project_from_params

    verts0 = model.forward(fl)
    wg0 = world_gaussians(params, aux, face_frames(verts0[0], model.faces))
    proj0 = project_from_params(wg0.means, wg0.scales, wg0.quats, cam, alive=wg0.alive)
    bins0 = bin_pairs(
        proj0, HEIGHT, WIDTH, TILE,
        opacity=jnp.where(proj0.mask, wg0.opacity, 0.0),
        with_pos=True, pair_cap=TILE.pair_cap,
    )
    overflow = int(bins0.overflow) + int(bins0.budget_overflow)
    print(f"pair binning: total={int(bins0.total)}/{TILE.pair_cap}, "
          f"max tile count={int(bins0.counts.max())}, "
          f"overflow={int(bins0.overflow)}, "
          f"budget_overflow={int(bins0.budget_overflow)}", file=sys.stderr)
    assert overflow == 0, (
        f"pair binning overflow ({overflow} pairs dropped) — bench numbers "
        "would be measured on partially rendered frames"
    )

    # Speed-of-light model at this scene's actual occupancy
    # (utils/roofline.py; BASELINE.md:32 asks for the %-of-SoL framing).
    from gaussianavatars_tpu.utils.roofline import pairs_roofline

    sol = pairs_roofline(
        np.asarray(bins0.counts), TILE.tile_h * TILE.tile_w,
        n_expand=bins0.n_expand, pair_cap=TILE.pair_cap,
        height=HEIGHT, width=WIDTH,
    )
    print(
        "roofline (v5e, pair layout): "
        f"fwd {sol['t_fwd_vpu_ms']:.2f}ms + bwd {sol['t_bwd_vpu_ms']:.2f}ms "
        f"+ sort {sol['t_sort_ms']:.2f}ms + gather {sol['t_gather_ms']:.2f}ms "
        f"+ unpermute {sol['t_unpermute_ms']:.2f}ms "
        f"(HBM floor {sol['t_hbm_floor_ms']:.2f}ms) → "
        f"SoL render {sol['sol_render_fps']:.0f} FPS, "
        f"SoL train {sol['sol_train_iters_s']:.0f} it/s "
        f"({sol['sol_train_mpix_s']:.0f} Mpix/s)",
        file=sys.stderr,
    )

    init = (jnp.zeros((HEIGHT, WIDTH, 3)), jnp.zeros(()))
    r = run_render(init)
    target = r[0]
    float(r[1])  # block: compile + warm-up round

    fps_rounds = []
    for rd in range(N_ROUNDS):
        t0 = time.perf_counter()
        r = run_render(init)
        float(r[1])
        fps_rounds.append(N_ITER / (time.perf_counter() - t0))
        print(f"round {rd}: {fps_rounds[-1]:.1f} FPS", file=sys.stderr)
    fps = float(np.mean(fps_rounds))

    # --- fwd+bwd training-style throughput ----------------------------------
    n_bwd = 100

    def measure_fwd_bwd(amp: bool) -> float:
        def fwd_bwd(carry, _i):
            s, = carry
            jaw = jnp.zeros((1, 3)) + s * 1e-9

            def loss_fn(p):
                verts = model.forward(fl._replace(jaw=jaw))
                frames = face_frames(verts[0], model.faces)
                wg = world_gaussians(p, aux, frames)
                out = render_tiled(
                    wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
                    sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE,
                    use_pallas=use_pallas, amp=amp,
                )
                return jnp.mean((out.color - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            return (s + loss * 0 + g.means[0, 0] * 0,)

        @jax.jit
        def run_bwd(carry):
            return jax.lax.fori_loop(0, n_bwd, lambda i, c: fwd_bwd(c, i), carry)

        r = run_bwd((jnp.zeros(()),))
        float(r[0])
        t0 = time.perf_counter()
        r = run_bwd((jnp.zeros(()),))
        float(r[0])
        return n_bwd / (time.perf_counter() - t0)

    iters_per_s = measure_fwd_bwd(amp=False)
    mpix = iters_per_s * WIDTH * HEIGHT / 1e6
    print(f"fwd+bwd: {iters_per_s:.2f} iters/s, {mpix:.1f} Mpix/s "
          f"({WIDTH}x{HEIGHT})", file=sys.stderr)
    # The use_amp policy (bf16 MXU-contraction inputs in the backward).
    iters_amp = measure_fwd_bwd(amp=True)
    print(f"fwd+bwd (use_amp): {iters_amp:.2f} iters/s "
          f"({100 * (iters_amp / iters_per_s - 1):+.1f}%)", file=sys.stderr)
    print(
        f"pct of SoL: render {100 * fps / sol['sol_render_fps']:.0f}%, "
        f"fwd+bwd {100 * iters_per_s / sol['sol_train_iters_s']:.0f}%",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "render_fps_802x550_92k",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "pct_sol_render": round(100 * fps / sol["sol_render_fps"], 1),
        "pct_sol_fwd_bwd": round(100 * iters_per_s / sol["sol_train_iters_s"], 1),
        "fwd_bwd_iters_s": round(iters_per_s, 2),
        "fwd_bwd_amp_iters_s": round(iters_amp, 2),
    }))


if __name__ == "__main__":
    main()
