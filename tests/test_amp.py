"""Mixed-precision (AMP) policy parity: `OptimizationConfig.use_amp`.

The reference treats AMP as a first-class speed lever (train.py:69-72,
GradScaler). On TPU there is no loss scaling — bf16 has f32's exponent
range — so the policy is purely a compute-dtype selection:

  * SSIM's banded-matrix blurs run with bf16 matmul inputs / f32
    accumulation (one MXU pass instead of Precision.HIGHEST's six),
  * the Pallas backward compositor's moment/colour contractions take bf16
    inputs with f32 accumulation,
  * everything conditioning-critical (Adam state with eps=1e-15, EWA conic
    inversion, transmittance recurrence, positions) stays f32.

These tests QUANTIFY the tolerance: the amp step must track the f32 step
to sub-percent loss error and >0.999 update cosine similarity, and a short
training run must reach the same loss plateau.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.config import Config, OptimizationConfig
from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.models.gaussians import init_from_points
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig
from gaussianavatars_tpu.training.loss import ssim
from gaussianavatars_tpu.training.trainer import init_train_state, make_train_step

TILE = TileConfig(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16)


def _setup(n=80, cap=128, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32) * 0.3
    cols = rng.rand(n, 3).astype(np.float32)
    params, aux = init_from_points(
        pts, cols, capacity=cap, init_scale=np.full(n, 0.08, np.float32)
    )
    cam = look_at_camera(eye=(0, 0, -2.5), fovy=0.8, width=64, height=48)
    gt = jnp.asarray(
        rng.rand(cam.height, cam.width, 3).astype(np.float32) * 0.5 + 0.25
    )
    return params, aux, cam, gt


def test_ssim_amp_close():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(3, 48, 64).astype(np.float32))
    b = jnp.clip(a + 0.05 * jnp.asarray(rng.randn(3, 48, 64).astype(np.float32)), 0, 1)
    s32 = float(ssim(a, b))
    s16 = float(ssim(a, b, amp=True))
    assert abs(s32 - s16) < 5e-3, (s32, s16)
    # And its gradient (drives training) stays aligned.
    g32 = jax.grad(lambda x: ssim(x, b))(a)
    g16 = jax.grad(lambda x: ssim(x, b, amp=True))(a)
    cos = jnp.sum(g32 * g16) / (jnp.linalg.norm(g32) * jnp.linalg.norm(g16))
    assert float(cos) > 0.999, float(cos)


def _clone(tree):
    """Fresh device buffers (the jitted step donates its input state)."""
    return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), tree)


def _one_step(use_amp, use_pallas, params, aux, cam, gt):
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        opt=dataclasses.replace(cfg.opt, use_amp=use_amp),
        pipeline=dataclasses.replace(cfg.pipeline, use_pallas=use_pallas),
    )
    state = init_train_state(_clone(params), _clone(aux), cfg)
    step = make_train_step(None, cfg, TILE)
    out = step(state, gt, cam, jnp.int32(0), jnp.zeros(3), sh_degree=0)
    return out


def test_amp_step_parity():
    """One full train step (pallas-interpret compositor): amp vs f32."""
    params, aux, cam, gt = _setup()
    p0 = {k: np.asarray(getattr(params, k)).copy()
          for k in ("means", "log_scales", "logit_opacity", "sh_dc")}
    o32 = _one_step(False, True, params, aux, cam, gt)
    o16 = _one_step(True, True, params, aux, cam, gt)
    l32, l16 = float(o32.metrics["loss"]), float(o16.metrics["loss"])
    assert abs(l32 - l16) / max(abs(l32), 1e-9) < 1e-2, (l32, l16)
    # Parameter UPDATES (new - old) must agree in direction and scale.
    for name in ("means", "log_scales", "logit_opacity", "sh_dc"):
        upd32 = np.asarray(getattr(o32.state.params, name)) - p0[name]
        upd16 = np.asarray(getattr(o16.state.params, name)) - p0[name]
        n32 = np.linalg.norm(upd32)
        if n32 < 1e-12:
            continue
        cos = float(
            np.sum(upd32 * upd16) / (n32 * max(np.linalg.norm(upd16), 1e-12))
        )
        # Adam's first-step update is sign-like (m/√v̂ ≈ ±1), so sub-percent
        # gradient differences get amplified into sign flips on near-zero
        # entries; 0.98 cosine on the UPDATE corresponds to ≲0.5% relative
        # gradient error (measured 0.992 on means).
        assert cos > 0.98, (name, cos)
        assert abs(np.linalg.norm(upd16) - n32) / n32 < 0.1, (name,)


def test_amp_training_converges_like_f32():
    """30 steps: the amp run reaches the same loss plateau as f32."""
    params, aux, cam, gt = _setup()

    def run(use_amp):
        cfg = dataclasses.replace(
            Config(), opt=dataclasses.replace(OptimizationConfig(), use_amp=use_amp)
        )
        state = init_train_state(_clone(params), _clone(aux), cfg)
        step = make_train_step(None, cfg, TILE)
        bg = jnp.zeros(3)
        for _ in range(30):
            out = step(state, gt, cam, jnp.int32(0), bg, sh_degree=0)
            state = out.state
        return float(out.metrics["loss"])

    l32 = run(False)
    l16 = run(True)
    assert np.isfinite(l16)
    assert abs(l16 - l32) / max(abs(l32), 1e-9) < 0.1, (l32, l16)
