"""Pair-layout rasterizer: parity with the table/scan ground truth.

The pair pipeline (`ops/pairs.py` + `ops/rasterize_pairs.py`) must produce
bit-equal images and matching gradients to the capacity-table path
(`ops/rasterize_tiled.py`), which is itself tested against the dense O(N·P)
reference. Run on CPU (kernels in interpret mode) via conftest.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.ops.pairs import bin_pairs, pairs_to_table
from gaussianavatars_tpu.ops.projection import project_from_params
from gaussianavatars_tpu.ops.rasterize_pairs import rasterize_pairs
from gaussianavatars_tpu.ops.rasterize_tiled import (
    TileConfig, bin_gaussians, composite_tiles, rasterize_binned, render_tiled,
)
from gaussianavatars_tpu.ops.sh import eval_sh_color_kc


H, W = 64, 96
CFG = TileConfig(tile_h=8, tile_w=16, capacity=64, max_tiles_per_gaussian=16)


def make_scene(n=200, seed=0, opac_lo=0.2, opac_hi=0.9):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.normal(k1, (n, 3)) * jnp.array([0.8, 0.6, 0.3]) + jnp.array(
        [0.0, 0.0, 2.5]
    )
    scales = jax.random.uniform(k2, (n, 3), minval=0.01, maxval=0.12)
    quats = jax.random.normal(k3, (n, 4))
    opacity = jax.random.uniform(k4, (n,), minval=opac_lo, maxval=opac_hi)
    colors = jax.random.uniform(k5, (n, 3))
    cam = look_at_camera(
        eye=np.array([0.0, 0.0, 0.0]), target=np.array([0.0, 0.0, 2.5]),
        fovy=1.0, width=W, height=H,
    )
    return means, scales, quats, opacity, colors, cam


def screen_inputs(scene, cfg=CFG):
    means, scales, quats, opacity, colors, cam = scene
    proj = project_from_params(means, scales, quats, cam)
    opac = jnp.where(proj.mask, opacity, 0.0)
    return proj, opac, colors, cam


def test_bin_pairs_matches_bin_gaussians():
    scene = make_scene()
    proj, opac, colors, cam = screen_inputs(scene)
    binned = bin_gaussians(proj, H, W, CFG, pallas_table=False, opacity=opac)
    bins = bin_pairs(proj, H, W, CFG, opacity=opac, with_pos=True)
    np.testing.assert_array_equal(np.asarray(bins.counts), np.asarray(binned.counts))
    assert int(bins.overflow) == 0
    assert int(bins.budget_overflow) == int(binned.budget_overflow)
    table = pairs_to_table(bins, CFG.capacity)
    np.testing.assert_array_equal(np.asarray(table), np.asarray(binned.idx))
    # Segments are contiguous over the valid prefix.
    starts = np.asarray(bins.tile_starts)
    counts = np.asarray(bins.counts)
    np.testing.assert_array_equal(starts[1:], starts[:-1] + counts[:-1])
    assert int(bins.total) == int(starts[-1] + counts[-1])
    # pos is unique across the whole kept prefix (a permutation slice).
    pos = np.asarray(bins.pos)
    assert len(np.unique(pos)) == pos.shape[0]


@pytest.mark.parametrize("opac_hi,seed", [(0.9, 0), (0.999, 1)])
def test_rasterize_pairs_forward_parity(opac_hi, seed):
    scene = make_scene(seed=seed, opac_hi=opac_hi)
    proj, opac, colors, cam = screen_inputs(scene)
    bg = jnp.array([0.1, 0.2, 0.3])

    binned = bin_gaussians(proj, H, W, CFG, pallas_table=False, opacity=opac)
    img_ref, alpha_ref = rasterize_binned(
        proj.mean2d, proj.conic, colors, opac, binned, H, W, bg, CFG,
        compositor=composite_tiles,
    )
    bins = bin_pairs(proj, H, W, CFG, opacity=opac, with_pos=True)
    img, alpha = rasterize_pairs(
        proj.mean2d, proj.conic, colors, opac, bins, H, W, bg, CFG
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref), atol=1e-5)


def test_rasterize_pairs_handles_over_capacity_tiles():
    # A scene whose hottest tile far exceeds the table capacity: the pair
    # path must match a big-capacity table reference exactly.
    scene = make_scene(n=400, seed=2, opac_lo=0.4, opac_hi=0.7)
    means, scales, quats, opacity, colors, cam = scene
    means = means.at[:, :2].multiply(0.05)   # pile splats onto few tiles
    proj = project_from_params(means, scales, quats, cam)
    opac = jnp.where(proj.mask, opacity, 0.0)
    bg = jnp.zeros(3)

    small = dataclasses.replace(CFG, capacity=32)
    binned_small = bin_gaussians(proj, H, W, small, pallas_table=False, opacity=opac)
    assert int(binned_small.overflow) > 0, "scene must overflow the small table"

    big = dataclasses.replace(CFG, capacity=512)
    binned = bin_gaussians(proj, H, W, big, pallas_table=False, opacity=opac)
    assert int(binned.overflow) == 0
    img_ref, _ = rasterize_binned(
        proj.mean2d, proj.conic, colors, opac, binned, H, W, bg, big,
        compositor=composite_tiles,
    )
    bins = bin_pairs(proj, H, W, small, opacity=opac, with_pos=True)
    assert int(bins.overflow) == 0    # pair layout has no per-tile capacity
    img, _ = rasterize_pairs(
        proj.mean2d, proj.conic, colors, opac, bins, H, W, bg, small
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=1e-5)


def test_rasterize_pairs_grad_parity():
    scene = make_scene(seed=3, opac_hi=0.95)
    proj, opac, colors, cam = screen_inputs(scene)
    bg = jnp.array([0.5, 0.4, 0.3])
    wimg = jax.random.normal(jax.random.PRNGKey(9), (H, W, 3))
    walpha = jax.random.normal(jax.random.PRNGKey(10), (H, W))

    binned = bin_gaussians(proj, H, W, CFG, pallas_table=False, opacity=opac)
    bins = bin_pairs(proj, H, W, CFG, opacity=opac, with_pos=True)

    def loss_ref(m2d, conic, col, op):
        img, alpha = rasterize_binned(
            m2d, conic, col, op, binned, H, W, bg, CFG, compositor=composite_tiles
        )
        return jnp.sum(img * wimg) + jnp.sum(alpha * walpha)

    def loss_pairs(m2d, conic, col, op):
        img, alpha = rasterize_pairs(m2d, conic, col, op, bins, H, W, bg, CFG)
        return jnp.sum(img * wimg) + jnp.sum(alpha * walpha)

    args = (proj.mean2d, proj.conic, colors, opac)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_pairs = jax.grad(loss_pairs, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_pairs, g_ref, ["mean2d", "conic", "color", "opac"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_rasterize_pairs_grad_parity_two_class():
    # Two-class binning (big_slots > 0) changes the expansion layout to
    # concat(small [N, sb], big [nb, budget]); the pair backward must reduce
    # both classes onto the right Gaussians (PairBins.big_idx).
    scene = make_scene(seed=5, opac_hi=0.95)
    proj, opac, colors, cam = screen_inputs(scene)
    cfg2 = dataclasses.replace(CFG, big_slots=32, small_budget=2)
    bg = jnp.array([0.2, 0.1, 0.6])
    wimg = jax.random.normal(jax.random.PRNGKey(11), (H, W, 3))

    binned = bin_gaussians(proj, H, W, cfg2, pallas_table=False, opacity=opac)
    bins = bin_pairs(proj, H, W, cfg2, opacity=opac, with_pos=True)
    assert bins.big_idx is not None and bins.small_budget == 2
    np.testing.assert_array_equal(np.asarray(bins.counts), np.asarray(binned.counts))

    def loss_ref(m2d, conic, col, op):
        img, _ = rasterize_binned(
            m2d, conic, col, op, binned, H, W, bg, cfg2, compositor=composite_tiles
        )
        return jnp.sum(img * wimg)

    def loss_pairs(m2d, conic, col, op):
        img, _ = rasterize_pairs(m2d, conic, col, op, bins, H, W, bg, cfg2)
        return jnp.sum(img * wimg)

    args = (proj.mean2d, proj.conic, colors, opac)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_pairs = jax.grad(loss_pairs, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_pairs, g_ref, ["mean2d", "conic", "color", "opac"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_render_tiled_pairs_mode_matches_scan():
    scene = make_scene(seed=4)
    means, scales, quats, opacity, colors, cam = scene
    bg = jnp.array([0.0, 0.0, 0.0])
    sh = jnp.concatenate([colors[:, None, :], jnp.zeros((colors.shape[0], 15, 3))], 1)
    out_scan = render_tiled(
        means, scales, quats, opacity, cam, bg, sh=sh, sh_degree=3,
        cfg=CFG, use_pallas=False,
    )
    out_pairs = render_tiled(
        means, scales, quats, opacity, cam, bg, sh=sh, sh_degree=3,
        cfg=CFG, use_pallas=True, pairs=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_pairs.color), np.asarray(out_scan.color), atol=1e-5
    )
