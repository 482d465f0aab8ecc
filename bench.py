"""Benchmark: avatar render FPS + real-train-step throughput on one chip.

Mirrors the reference FPS protocol (`fps_benchmark_demo.py:53-80`): a fixed
view at 802×550, 500 renders × 3 rounds, FLAME mesh update included in every
frame. The headline JSON line reports render FPS against the reference's 85
FPS baseline (`INNOVATIONS_5.md:16`, BASELINE.md), plus:

  * `fwd_bwd_iters_s` — bare render fwd+bwd (MSE loss), the kernel-path
    throughput number;
  * `train_step_iters_s` — the FULL production train step
    (`training.trainer.make_train_step`: L1 + D-SSIM + binding
    regularisers + densify-stat accumulation + per-group Adam + FLAME
    optimiser), dispatched through `make_train_scan` exactly like
    `scripts/train.py` does;
  * `pct_sol_*` — measured vs the stage roofline (`utils/roofline.py`).

Scene: ~92k Gaussians (9 per FLAME face) with *trained-avatar-like*
statistics — splats hugging their triangles, sub-triangle scales, high
opacity — matching the regime the reference's 85 FPS number was measured in.

The rasterizer runs the round-4 production configuration: the sorted-data
pipeline (`ops/rasterize_sorted.py`) with DEFAULT tier budgets — no
hand-tuned knobs; what `scripts/train.py` runs out of the box is what is
measured here. Binning truncation is asserted zero (`budget_overflow`), so
the headline is never measured on partially rendered frames.

Timing protocol: renders are chained inside ONE jitted `lax.fori_loop`
(each frame consumes a value from the previous), then a host transfer of the
final scalar blocks on the whole chain — the TPU-tunnel analogue of
CUDA-event timing (no dispatch noise, no overlap-cheating).
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


def build_scene(per_face=9, seed=0):
    key = jax.random.PRNGKey(seed)
    assets = synthetic_assets(n_shape=100, n_expr=50, seed=seed)
    model = FlameModel(assets, FlameConfig(n_shape=100, n_expr=50, add_teeth=True))
    n = model.num_faces * per_face
    # Pad to a 8192-multiple: the padded capacity multiplies every
    # per-Gaussian cost (projection, the footprint sort, the base-tier
    # expansion).
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


def parity_check() -> dict:
    """On-TPU numerical parity gate (VERDICT r4 item 3): one frame +
    backward through the Mosaic-COMPILED sorted pipeline, checked two ways
    on this chip:

      * image/alpha vs the dense O(N·P) ground truth (independent math);
      * full input gradients vs the SAME sorted pipeline with the Pallas
        kernels in interpret mode (independent compiler path) — this is
        the Mosaic-miscompile detector, and it is bit-exact in practice.

    Gradients are deliberately NOT asserted against the dense reference on
    TPU: measured on this hardware the dense formulation's own autodiff
    pullback (cumprod chains + [P,N]-reduction contractions) deviates up
    to ~0.3 max-rel from its CPU evaluation, while the compiled sorted
    pipeline matches the CPU ground truth to ~1e-5 when fed identical
    projected inputs (see docs/tpu_performance.md, round-5 notes). The
    sorted-vs-dense gradient allclose is a CPU-suite property
    (tests/test_rasterize_sorted.py), where both evaluations are sound.
    Small scene so the dense image reference stays cheap; it exercises the
    identical kernel code (multi-chunk walks, early stop)."""
    from gaussianavatars_tpu.ops.projection import project_from_params
    from gaussianavatars_tpu.ops.rasterize_dense import render_dense
    from gaussianavatars_tpu.ops.rasterize_sorted import rasterize_sorted
    from gaussianavatars_tpu.ops.sort_binning import TierSpec

    # Scene sized so the dense reference's [P, N] alpha matrix (and its
    # backward) fit comfortably in HBM; splat statistics (scale, opacity,
    # heavy tile overlap) match the benchmark regime so the same kernel
    # code paths (multi-chunk walks, early stop) execute.
    h, w, th, tw = 128, 256, 32, 32
    _n = 4096
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.normal(k1, (_n, 3)) * jnp.array([0.8, 0.6, 0.3]) + jnp.array(
        [0.0, 0.0, 2.5]
    )
    scales = jax.random.uniform(k2, (_n, 3), minval=0.005, maxval=0.06)
    quats = jax.random.normal(k3, (_n, 4))
    opacity = jax.random.uniform(k4, (_n,), minval=0.3, maxval=0.98)
    colors_in = jax.random.uniform(k5, (_n, 3))
    cam = look_at_camera(
        eye=np.zeros(3), target=np.array([0.0, 0.0, 2.5]),
        fovy=0.9, width=w, height=h,
    )
    proj = project_from_params(means, scales, quats, cam)
    colors = colors_in
    opac = jnp.where(proj.mask, opacity, 0.0)
    bg = jnp.array([0.1, 0.2, 0.3])
    spec = TierSpec(base=2, tiers=((4096, 64),))  # generous: no truncation
    key = jax.random.PRNGKey(0)
    wimg = jax.random.normal(key, (h, w, 3))
    walpha = jax.random.normal(jax.random.split(key)[0], (h, w))

    def loss_sorted(m2d, conic, col, op):
        img, alpha, plan = rasterize_sorted(
            proj._replace(mean2d=m2d, conic=conic), col, op, h, w, bg, th, tw,
            spec,
        )
        return jnp.sum(img * wimg) + jnp.sum(alpha * walpha), (img, plan)

    def loss_dense(m2d, conic, col, op):
        out = render_dense(
            means, scales, quats, op, cam, bg, colors=col,
            projected=proj._replace(mean2d=m2d, conic=conic),
            tile_cull=(th, tw),
        )
        return (jnp.sum(out.color * wimg) + jnp.sum(out.alpha * walpha),
                (out.color, None))

    args = (proj.mean2d, proj.conic, colors, opac)
    f_s = jax.jit(jax.value_and_grad(loss_sorted, argnums=(0, 1, 2, 3), has_aux=True))
    f_d = jax.jit(jax.value_and_grad(loss_dense, argnums=(0, 1, 2, 3), has_aux=True))
    (_ls, (img_s, plan)), g_s = f_s(*args)
    (_ld, (img_d, _)), g_d = f_d(*args)
    assert int(plan.budget_overflow) == 0
    img_err = float(jnp.abs(img_s - img_d).max())

    # Same trace, Pallas forced through the interpret path (plain XLA ops).
    from gaussianavatars_tpu.ops.pallas import composite_pairs as _cp
    saved = _cp._should_interpret
    try:
        _cp._should_interpret = lambda: True
        f_i = jax.jit(
            jax.value_and_grad(loss_sorted, argnums=(0, 1, 2, 3), has_aux=True)
        )
        (_li, (_img_i, _)), g_i = f_i(*args)
    finally:
        _cp._should_interpret = saved
    grad_errs = {}
    for name, a, b in zip(("mean2d", "conic", "colors", "opacity"), g_s, g_i):
        scale = float(jnp.abs(jnp.asarray(b)).max()) or 1.0
        grad_errs[name] = float(jnp.abs(a - b).max()) / scale
    grad_err = max(grad_errs.values())
    print(f"parity ({h}x{w}, {_n} splats): img vs dense max err {img_err:.2e}; "
          f"grads compiled-vs-interpret max rel err {grad_err:.2e} "
          f"({grad_errs})", file=sys.stderr)
    assert img_err < 1e-4, f"image parity failure: {img_err}"
    assert grad_err < 1e-4, f"gradient parity failure: {grad_errs}"
    return {"img": img_err, "grad": grad_err}


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    on_tpu = jax.default_backend() == "tpu"
    # The headline number is a TPU number: off-TPU the kernels run in
    # interpret mode and the result would be meaningless (ADVICE r3).
    assert on_tpu, "bench.py headline must be measured on TPU"
    # Numerical parity gate guards the headline: compiled kernels must
    # match the dense ground truth on this chip before any FPS is reported.
    parity = parity_check()
    model, params, aux, fl, cam, n_gauss = build_scene()
    print(f"scene: {n_gauss} Gaussians, {model.num_faces} faces", file=sys.stderr)

    # --- init-time tier auto-probe (the DEFAULT path: scripts/train.py and
    # training/loop.py run the same probe before compiling their steps, so
    # what is measured here is what a default training run gets) ----------
    from gaussianavatars_tpu.ops.projection import project_from_params
    from gaussianavatars_tpu.ops.rasterize_sorted import rasterize_sorted
    from gaussianavatars_tpu.ops.sh import eval_sh_color_kc
    from gaussianavatars_tpu.ops.sort_binning import bbox_tiles, probe_tiers

    verts0 = model.forward(fl)
    wg0 = world_gaussians(params, aux, face_frames(verts0[0], model.faces))
    proj0 = project_from_params(wg0.means, wg0.scales, wg0.quats, cam, alive=wg0.alive)
    dirs0 = wg0.means - cam.camera_center
    dirs0 = dirs0 / jnp.linalg.norm(dirs0, axis=-1, keepdims=True).clip(1e-12)
    colors0 = eval_sh_color_kc(wg0.sh, dirs0, 3)
    opac0 = jnp.where(proj0.mask, wg0.opacity, 0.0)
    _tx, _ty, _bw, ntiles0, _nty, _ntx = bbox_tiles(
        proj0, HEIGHT, WIDTH, 32, 32, opacity=opac0
    )
    fps0 = np.asarray(jnp.where(proj0.mask, ntiles0, 0))
    spec = probe_tiers(fps0)
    TILE = TileConfig(tile_h=32, tile_w=32, base_budget=spec.base, tiers=spec.tiers)

    def render_frame(carry, _i):
        _img, s = carry
        jaw = jnp.zeros((1, 3)) + s * 1e-9   # FLAME update every frame
        verts = model.forward(fl._replace(jaw=jaw))
        frames = face_frames(verts[0], model.faces)
        wg = world_gaussians(params, aux, frames)
        out = render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
            sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE,
        )
        return (out.color, s + out.color[0, 0, 0] * 0)

    @jax.jit
    def run_render(carry):
        return jax.lax.fori_loop(0, N_ITER, lambda i, c: render_frame(c, i), carry)

    # Guard: the tier budgets must not truncate anything, or the headline
    # FPS is measured on partial frames. The sorted layout has no pair/tile
    # capacity; the only budget is the per-Gaussian tier budget.
    _img0, _a0, plan0 = jax.jit(lambda: rasterize_sorted(
        proj0, colors0, opac0, HEIGHT, WIDTH, jnp.zeros(3),
        TILE.tile_h, TILE.tile_w, spec,
    ))()
    m_expand = spec.expansion_size(wg0.means.shape[0])
    print(f"tier spec: base={spec.base} tiers={spec.tiers} "
          f"(expansion {m_expand} slots)", file=sys.stderr)
    print(f"binning: total={int(plan0.total)} pairs, "
          f"max tile count={int(plan0.counts.max())}, "
          f"max footprint={int(plan0.max_footprint)}, "
          f"budget_overflow={int(plan0.budget_overflow)}", file=sys.stderr)
    assert int(plan0.budget_overflow) == 0, (
        "tier-budget overflow — bench numbers would be measured on "
        "partially rendered frames"
    )

    # Speed-of-light model at this scene's actual occupancy
    # (utils/roofline.py; BASELINE.md asks for the %-of-SoL framing).
    from gaussianavatars_tpu.utils.roofline import sorted_roofline

    sol = sorted_roofline(
        np.asarray(plan0.counts), TILE.tile_h * TILE.tile_w,
        n_gauss=wg0.means.shape[0], n_expand=m_expand,
        height=HEIGHT, width=WIDTH,
    )
    print(
        "roofline (v5e, sorted-data layout): "
        f"fwd {sol['t_fwd_vpu_ms']:.2f}ms + bwd {sol['t_bwd_vpu_ms']:.2f}ms "
        f"+ binning {sol['t_binning_ms']:.2f}ms "
        f"+ grad-reduce {sol['t_grad_reduce_ms']:.2f}ms "
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

    # --- bare fwd+bwd throughput (MSE) --------------------------------------
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
                    sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=TILE, amp=amp,
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
    iters_amp = measure_fwd_bwd(amp=True)
    print(f"fwd+bwd (use_amp): {iters_amp:.2f} iters/s "
          f"({100 * (iters_amp / iters_per_s - 1):+.1f}%)", file=sys.stderr)

    # --- FULL train step (the production dispatch) --------------------------
    # make_train_scan: L1 + D-SSIM + binding regularisers + densify stats +
    # Adam (+ FLAME optimiser), K steps per call — what scripts/train.py runs.
    from gaussianavatars_tpu.config import Config, ModelConfig, OptimizationConfig, PipelineConfig
    from gaussianavatars_tpu.data.cameras import jit_static_key
    from gaussianavatars_tpu.training.trainer import (
        init_train_state, make_train_scan, stack_cameras,
    )

    cfg = Config(
        model=ModelConfig(capacity=params.capacity, n_shape=100, n_expr=50),
        pipeline=PipelineConfig(tile_h=TILE.tile_h, tile_w=TILE.tile_w),
        opt=OptimizationConfig(),
    )
    state = init_train_state(
        params, aux, cfg, num_timesteps=2, n_expr=50, n_shape=100,
        num_verts=model.num_verts,
    )
    scan_fn = make_train_scan(model, cfg, TILE)
    k_steps = 50
    cache = (jnp.clip(target, 0, 1)[None] * 255).astype(jnp.uint8)
    views = jnp.zeros((k_steps,), jnp.int32)
    cams = stack_cameras([jit_static_key(cam)] * k_steps)
    ts = jnp.zeros((k_steps,), jnp.int32)
    bg = jnp.zeros(3)

    st, m = scan_fn(state, cache, views, cams, ts, bg, sh_degree=3)
    float(m["loss"][-1])
    state2 = jax.tree_util.tree_map(jnp.array, st)  # fresh buffers (donated)
    t0 = time.perf_counter()
    st, m = scan_fn(state2, cache, views, cams, ts, bg, sh_degree=3)
    float(m["loss"][-1])
    train_iters_s = k_steps / (time.perf_counter() - t0)
    print(f"full train step (scan): {train_iters_s:.2f} iters/s "
          f"({1e3 / train_iters_s:.2f} ms/iter)", file=sys.stderr)

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
        "train_step_iters_s": round(train_iters_s, 2),
        "parity_max_err": {
            "img": round(parity["img"], 9), "grad_rel": round(parity["grad"], 9),
        },
    }))


if __name__ == "__main__":
    main()
