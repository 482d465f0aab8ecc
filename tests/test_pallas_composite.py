"""Pallas compositor (interpret mode on CPU) vs the scan compositor."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.ops.rasterize_tiled import (
    TileConfig, bin_gaussians, composite_tiles, rasterize_binned, render_tiled,
)
from gaussianavatars_tpu.ops.pallas.composite import make_pallas_compositor


def _scene(n=400, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    means = jax.random.normal(k1, (n, 3)) * 0.5
    scales = jax.random.uniform(k2, (n, 3), minval=0.02, maxval=0.12)
    quats = jax.random.normal(k3, (n, 4))
    opac = jax.random.uniform(k4, (n,), minval=0.2, maxval=0.95)
    colors = jax.random.uniform(key, (n, 3))
    cam = look_at_camera(eye=np.array([0.0, 0.0, -3.0]), fovy=0.7, width=64, height=48)
    return means, scales, quats, opac, colors, cam


CFG = TileConfig(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16)


def _both(seed=0):
    means, scales, quats, opac, colors, cam = _scene(seed=seed)
    out_scan = render_tiled(
        means, scales, quats, opac, cam, jnp.array([0.1, 0.2, 0.3]),
        colors=colors, cfg=CFG, use_pallas=False,
    )
    out_pl = render_tiled(
        means, scales, quats, opac, cam, jnp.array([0.1, 0.2, 0.3]),
        colors=colors, cfg=CFG, use_pallas=True, pairs=False,
    )
    return out_scan, out_pl


def test_forward_matches_scan():
    out_scan, out_pl = _both()
    assert float(out_scan.color.max()) > 0.3  # something rendered
    np.testing.assert_allclose(
        np.asarray(out_pl.color), np.asarray(out_scan.color), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_pl.alpha), np.asarray(out_scan.alpha), atol=2e-6
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_gradients_match_scan(seed):
    means, scales, quats, opac, colors, cam = _scene(seed=seed)
    target = jnp.zeros((48, 64, 3)) + 0.25

    def loss(means, scales, quats, opac, colors, use_pallas):
        out = render_tiled(
            means, scales, quats, opac, cam, jnp.zeros(3),
            colors=colors, cfg=CFG, use_pallas=use_pallas, pairs=False,
        )
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.alpha)

    g_scan = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors, False
    )
    g_pl = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors, True
    )
    for gs, gp, name in zip(g_scan, g_pl, ["means", "scales", "quats", "opac", "colors"]):
        gs, gp = np.asarray(gs), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gs).max() + 1e-12
        np.testing.assert_allclose(gp, gs, atol=3e-5 * scale, rtol=2e-4,
                                   err_msg=name)


def test_early_stop_parity_with_opaque_scene():
    """Near-opaque overlapping Gaussians exercise the T<1e-4 stop path."""
    means, scales, quats, _, colors, cam = _scene()
    opac = jnp.full((means.shape[0],), 0.999)
    o1 = render_tiled(means, scales * 3.0, quats, opac, cam, jnp.zeros(3),
                      colors=colors, cfg=CFG, use_pallas=False)
    o2 = render_tiled(means, scales * 3.0, quats, opac, cam, jnp.zeros(3),
                      colors=colors, cfg=CFG, use_pallas=True, pairs=False)
    np.testing.assert_allclose(np.asarray(o2.color), np.asarray(o1.color), atol=2e-6)


def test_cumprod_fwd_matches_loop_fwd(monkeypatch):
    """GSAVATARS_FWD_IMPL=cumprod must match the sequential fwd kernel
    bit-for-bit-ish on color/alpha, including an opaque early-stop scene."""
    for seed, opaque in [(0, False), (1, False), (0, True)]:
        means, scales, quats, opac, colors, cam = _scene(seed=seed)
        if opaque:
            opac = jnp.full_like(opac, 0.999)
            scales = scales * 3.0
        monkeypatch.delenv("GSAVATARS_FWD_IMPL", raising=False)
        base = render_tiled(means, scales, quats, opac, cam, jnp.array([0.3, 0.1, 0.6]),
                            colors=colors, cfg=CFG, use_pallas=True, pairs=False)
        monkeypatch.setenv("GSAVATARS_FWD_IMPL", "cumprod")
        alt = render_tiled(means, scales, quats, opac, cam, jnp.array([0.3, 0.1, 0.6]),
                           colors=colors, cfg=CFG, use_pallas=True, pairs=False)
        np.testing.assert_allclose(np.asarray(alt.color), np.asarray(base.color),
                                   atol=2e-6, err_msg=f"seed={seed} opaque={opaque}")
        np.testing.assert_allclose(np.asarray(alt.alpha), np.asarray(base.alpha),
                                   atol=2e-6, err_msg=f"seed={seed} opaque={opaque}")


def test_cumprod_fwd_grads_match_scan(monkeypatch):
    """The saved residuals (acc/t_final/stop) of the cumprod fwd must feed
    the backward identically: grads vs the scan compositor."""
    means, scales, quats, opac, colors, cam = _scene(seed=2)
    # Opaque-ish so the stop indices are actually exercised in the residuals.
    opac = jnp.clip(opac * 2.0, 0.0, 0.98)
    target = jnp.zeros((48, 64, 3)) + 0.4

    def loss(means, scales, quats, opac, colors, use_pallas):
        out = render_tiled(means, scales, quats, opac, cam, jnp.zeros(3),
                           colors=colors, cfg=CFG, use_pallas=use_pallas, pairs=False)
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.alpha)

    g_scan = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors, False)
    monkeypatch.setenv("GSAVATARS_FWD_IMPL", "cumprod")
    g_pl = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors, True)
    for gs, gp, name in zip(g_scan, g_pl, ["means", "scales", "quats", "opac", "colors"]):
        gs, gp = np.asarray(gs), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gs).max() + 1e-12
        np.testing.assert_allclose(gp, gs, atol=3e-5 * scale, rtol=2e-4,
                                   err_msg=name)


@pytest.mark.parametrize("impl", ["cumsum", "replay"])
def test_bwd_impl_grads_match_scan(impl, monkeypatch):
    """Every GSAVATARS_BWD_IMPL variant must produce the scan compositor's
    gradients (the default 'moments' is covered by test_gradients_match_scan)."""
    means, scales, quats, opac, colors, cam = _scene(seed=1)
    opac = jnp.clip(opac * 2.0, 0.0, 0.98)  # exercise the stop indices
    target = jnp.zeros((48, 64, 3)) + 0.3

    def loss(means, scales, quats, opac, colors, use_pallas):
        out = render_tiled(means, scales, quats, opac, cam, jnp.zeros(3),
                           colors=colors, cfg=CFG, use_pallas=use_pallas, pairs=False)
        return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.alpha)

    g_scan = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors, False)
    monkeypatch.setenv("GSAVATARS_BWD_IMPL", impl)
    g_pl = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors, True)
    for gs, gp, name in zip(g_scan, g_pl, ["means", "scales", "quats", "opac", "colors"]):
        gs, gp = np.asarray(gs), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gs).max() + 1e-12
        np.testing.assert_allclose(gp, gs, atol=3e-5 * scale, rtol=2e-4,
                                   err_msg=name)


def test_jit_and_value_grad_consistency():
    means, scales, quats, opac, colors, cam = _scene()

    @jax.jit
    def f(means):
        out = render_tiled(means, scales, quats, opac, cam, jnp.zeros(3),
                           colors=colors, cfg=CFG, use_pallas=True, pairs=False)
        return jnp.sum(out.color)

    v = f(means)
    g = jax.jit(jax.grad(f))(means)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
