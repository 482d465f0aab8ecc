"""Tiled rasterizer vs dense reference: forward and backward allclose."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.ops.rasterize_dense import render_dense
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig, bin_gaussians, render_tiled
from gaussianavatars_tpu.ops.projection import project_from_params

CFG = TileConfig(tile_h=16, tile_w=16, capacity=512, max_tiles_per_gaussian=64)


def make_scene(n=200, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.normal(k1, (n, 3)) * 0.4
    scales = jnp.abs(jax.random.normal(k2, (n, 3))) * 0.04 + 0.01
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = jax.nn.sigmoid(jax.random.normal(k4, (n,)) * 2)
    colors = jax.random.uniform(k5, (n, 3))
    return means, scales, quats, opacity, colors


def make_cam(width=64, height=48):
    return look_at_camera(eye=(0.1, -0.2, -2.2), fovy=0.9, width=width, height=height)


def test_binning_counts_match_bruteforce():
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(100)
    proj = project_from_params(means, scales, quats, cam)
    binned = bin_gaussians(proj, cam.height, cam.width, CFG)
    assert int(binned.overflow) == 0

    # Brute force: which tiles does each Gaussian's square bbox intersect?
    nty, ntx = CFG.grid(cam.height, cam.width)
    counts = np.zeros(nty * ntx, np.int32)
    m2d = np.asarray(proj.mean2d)
    rad = np.asarray(proj.radius)
    msk = np.asarray(proj.mask)
    for i in range(100):
        if not msk[i]:
            continue
        x0 = np.clip(int(np.floor((m2d[i, 0] - rad[i]) / CFG.tile_w)), 0, ntx)
        x1 = np.clip(int(np.floor((m2d[i, 0] + rad[i]) / CFG.tile_w)) + 1, 0, ntx)
        y0 = np.clip(int(np.floor((m2d[i, 1] - rad[i]) / CFG.tile_h)), 0, nty)
        y1 = np.clip(int(np.floor((m2d[i, 1] + rad[i]) / CFG.tile_h)) + 1, 0, nty)
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                counts[ty * ntx + tx] += 1
    np.testing.assert_array_equal(np.asarray(binned.counts), counts)


def test_tight_binning_exact_and_smaller():
    """Opacity-aware cutoff-ellipse bboxes drop only zero-alpha pairs: the
    rendered image is identical while binned pair counts shrink."""
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(200, seed=7)
    # Anisotropic splats + a low-opacity band make the tight box bite.
    scales = scales.at[:, 0].mul(6.0)
    opacity = opacity.at[:100].mul(0.05)
    proj = project_from_params(means, scales, quats, cam)
    opac_eff = jnp.where(proj.mask, opacity, 0.0)

    loose = bin_gaussians(proj, cam.height, cam.width, CFG)
    tight = bin_gaussians(proj, cam.height, cam.width, CFG, opacity=opac_eff)
    n_loose = int(jnp.sum(loose.counts))
    n_tight = int(jnp.sum(tight.counts))
    assert n_tight < n_loose, (n_tight, n_loose)

    from gaussianavatars_tpu.ops.rasterize_tiled import rasterize_binned

    bg = jnp.array([0.2, 0.3, 0.1])
    img_l, a_l = rasterize_binned(
        proj.mean2d, proj.conic, colors, opac_eff, loose,
        cam.height, cam.width, bg, CFG,
    )
    img_t, a_t = rasterize_binned(
        proj.mean2d, proj.conic, colors, opac_eff, tight,
        cam.height, cam.width, bg, CFG,
    )
    np.testing.assert_array_equal(np.asarray(img_t), np.asarray(img_l))
    np.testing.assert_array_equal(np.asarray(a_t), np.asarray(a_l))


def test_binning_depth_sorted_within_tile():
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(150, seed=3)
    proj = project_from_params(means, scales, quats, cam)
    binned = bin_gaussians(proj, cam.height, cam.width, CFG)
    idx = np.asarray(binned.idx)
    depth = np.asarray(proj.depth)
    for t in range(idx.shape[0]):
        ids = idx[t][idx[t] >= 0]
        d = depth[ids]
        assert np.all(np.diff(d) >= -1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tiled_matches_dense_forward(seed):
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(300, seed=seed)
    bg = jnp.array([0.2, 0.1, 0.4])
    out_d = render_dense(means, scales, quats, opacity, cam, bg, colors=colors,
                         tile_cull=(CFG.tile_h, CFG.tile_w))
    out_t = render_tiled(means, scales, quats, opacity, cam, bg, colors=colors, cfg=CFG)
    np.testing.assert_allclose(out_t.color, out_d.color, atol=2e-5)
    np.testing.assert_allclose(out_t.alpha, out_d.alpha, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out_t.radii), np.asarray(out_d.radii))


def test_tiled_matches_dense_grads():
    cam = make_cam(48, 32)
    means, scales, quats, opacity, colors = make_scene(120, seed=5)
    bg = jnp.zeros(3)
    target = jax.random.uniform(jax.random.PRNGKey(9), (cam.height, cam.width, 3))

    def loss_with(render_fn):
        def f(means, scales, quats, opacity, colors):
            out = render_fn(means, scales, quats, opacity, cam, bg, colors=colors)
            return jnp.mean((out.color - target) ** 2)
        return f

    dense_culled = lambda *a, **k: render_dense(*a, tile_cull=(CFG.tile_h, CFG.tile_w), **k)
    gd = jax.grad(loss_with(dense_culled), argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opacity, colors
    )
    gt = jax.grad(
        loss_with(lambda *a, **k: render_tiled(*a, cfg=CFG, **k)), argnums=(0, 1, 2, 3, 4)
    )(means, scales, quats, opacity, colors)
    names = ["means", "scales", "quats", "opacity", "colors"]
    for name, a, b in zip(names, gd, gt):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, err_msg=name)


def test_tiled_grads_vs_finite_difference():
    cam = make_cam(32, 32)
    means, scales, quats, opacity, colors = make_scene(20, seed=7)
    bg = jnp.zeros(3)

    def f(op):
        out = render_tiled(means, scales, quats, op, cam, bg, colors=colors, cfg=CFG)
        return jnp.sum(out.color)

    g = jax.grad(f)(opacity)
    eps = 1e-3
    for i in [0, 5, 13]:
        e = jnp.zeros_like(opacity).at[i].set(eps)
        fd = (f(opacity + e) - f(opacity - e)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=1e-2)


def test_capacity_overflow_reported():
    cam = make_cam()
    small = TileConfig(tile_h=16, tile_w=16, capacity=4, max_tiles_per_gaussian=64)
    means, scales, quats, opacity, colors = make_scene(300)
    proj = project_from_params(means, scales, quats, cam)
    binned = bin_gaussians(proj, cam.height, cam.width, small)
    assert int(binned.overflow) > 0
    assert int(binned.budget_overflow) == 0  # budget 64 generous here


def test_budget_overflow_reported():
    """A bbox wider than max_tiles_per_gaussian is truncated — must be
    counted (the capacity counter alone cannot see this loss mode)."""
    cam = make_cam()
    tiny_budget = TileConfig(tile_h=16, tile_w=16, capacity=64,
                             max_tiles_per_gaussian=1)
    means, scales, quats, opacity, colors = make_scene(50)
    proj = project_from_params(means, scales, quats, cam)
    binned = bin_gaussians(proj, cam.height, cam.width, tiny_budget)
    assert int(binned.budget_overflow) > 0
    # Generous budget on the same scene: zero.
    big = TileConfig(tile_h=16, tile_w=16, capacity=64,
                     max_tiles_per_gaussian=64)
    assert int(bin_gaussians(proj, cam.height, cam.width, big).budget_overflow) == 0


def test_odd_image_size_padding():
    cam = make_cam(57, 41)  # not multiples of the tile size
    means, scales, quats, opacity, colors = make_scene(100, seed=11)
    bg = jnp.array([0.5, 0.5, 0.5])
    out_d = render_dense(means, scales, quats, opacity, cam, bg, colors=colors,
                         tile_cull=(CFG.tile_h, CFG.tile_w))
    out_t = render_tiled(means, scales, quats, opacity, cam, bg, colors=colors, cfg=CFG)
    assert out_t.color.shape == (41, 57, 3)
    np.testing.assert_allclose(out_t.color, out_d.color, atol=2e-5)


def test_grow_tile_budgets():
    from gaussianavatars_tpu.training.loop import _grow_tile_budgets

    one = TileConfig(16, 16, 128, 8)
    g1 = _grow_tile_budgets(one, 0, 5, verbose=False)
    assert g1.max_tiles_per_gaussian == 16
    g2 = _grow_tile_budgets(one, 3, 0, verbose=False)
    assert g2.capacity == 256
    assert _grow_tile_budgets(one, 0, 0, verbose=False) is None
