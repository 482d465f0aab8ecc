"""Benchmark: avatar render FPS + fwd/bwd Mpix/s on one chip.

Mirrors the reference FPS protocol (`fps_benchmark_demo.py:53-80`): a fixed
view at 802×550, 500 renders × 3 rounds, FLAME mesh update included in every
frame. The headline JSON line reports render FPS against the reference's 85
FPS baseline (`INNOVATIONS_5.md:16`, BASELINE.md). Extra metrics (fwd+bwd
Mpix/s, train iters/s) go to stderr.

The scene approximates a trained avatar: ~92k Gaussians (9 per FLAME face)
with jittered triangle-local positions/scales.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Prefer the real FLAME template topology when available.
_t = "/root/reference/flame_model/assets/flame/head_template_mesh.obj"
if os.path.exists(_t):
    os.environ.setdefault("GSAVATARS_FLAME_TEMPLATE", _t)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    cap = 1 << (int(np.ceil(np.log2(n))))
    params, aux = init_bound(model.num_faces, capacity=cap, key=key, per_face=per_face)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    import dataclasses

    params = dataclasses.replace(
        params,
        means=jax.random.normal(k1, params.means.shape) * 0.4,
        log_scales=jnp.log(jax.random.uniform(k2, params.log_scales.shape, minval=0.3, maxval=1.5)),
        quats=jax.random.normal(k3, params.quats.shape),
        logit_opacity=jnp.full_like(params.logit_opacity, float(inverse_sigmoid(0.85))),
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
    tile_cfg = TileConfig(tile_h=32, tile_w=32, capacity=1024, max_tiles_per_gaussian=32)

    @jax.jit
    def render_frame(params, jaw):
        verts = model.forward(fl._replace(jaw=jaw))
        frames = face_frames(verts[0], model.faces)
        wg = world_gaussians(params, aux, frames)
        out = render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
            sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=tile_cfg,
        )
        return out.color

    @jax.jit
    def fwd_bwd(params, jaw, target):
        def loss_fn(params):
            img = render_frame(params, jaw)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        return loss, g.means

    jaw0 = jnp.zeros((1, 3))
    # Warm-up compiles (excluded from timing, like the reference's CUDA warmup).
    img = render_frame(params, jaw0)
    img.block_until_ready()
    target = img
    loss, g = fwd_bwd(params, jaw0, target)
    g.block_until_ready()

    # --- render FPS (reference protocol) -----------------------------------
    fps_rounds = []
    for r in range(N_ROUNDS):
        t0 = time.perf_counter()
        for i in range(N_ITER):
            img = render_frame(params, jaw0)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        fps_rounds.append(N_ITER / dt)
        print(f"round {r}: {fps_rounds[-1]:.1f} FPS", file=sys.stderr)
    fps = float(np.mean(fps_rounds))

    # --- fwd+bwd throughput -------------------------------------------------
    n_bwd = 100
    t0 = time.perf_counter()
    for i in range(n_bwd):
        loss, g = fwd_bwd(params, jaw0, target)
    g.block_until_ready()
    dt = time.perf_counter() - t0
    iters_per_s = n_bwd / dt
    mpix_fwd_bwd = iters_per_s * WIDTH * HEIGHT / 1e6
    print(
        f"fwd+bwd: {iters_per_s:.2f} iters/s, {mpix_fwd_bwd:.1f} Mpix/s "
        f"({WIDTH}x{HEIGHT})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "render_fps_802x550_92k",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
