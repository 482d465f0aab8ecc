"""Sorted-data rasterizer (round-4 production path): parity with the
table/scan ground truth, which is itself tested against the dense O(N·P)
reference. Runs on CPU (kernels in interpret mode) via conftest.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.ops.projection import project_from_params
from gaussianavatars_tpu.ops.rasterize_sorted import rasterize_sorted
from gaussianavatars_tpu.ops.rasterize_tiled import (
    TileConfig, bin_gaussians, composite_tiles, rasterize_binned, render_tiled,
)
from gaussianavatars_tpu.ops.sort_binning import TierSpec, default_tiers, grow_tiers

from raster_fixtures import CFG, H, W, make_scene, screen_inputs

# Budget 16 for every Gaussian (tier count ≥ padded n): identical bbox
# truncation to the table reference's max_tiles_per_gaussian=16.
SPEC = TierSpec(base=2, tiers=((512, 16),))


def run_sorted(proj, colors, opac, bg, spec=SPEC, th=CFG.tile_h, tw=CFG.tile_w):
    return rasterize_sorted(proj, colors, opac, H, W, bg, th, tw, spec)


def test_sorted_forward_parity():
    scene = make_scene(seed=0, opac_hi=0.9)
    proj, opac, colors, cam = screen_inputs(scene)
    bg = jnp.array([0.1, 0.2, 0.3])

    binned = bin_gaussians(proj, H, W, CFG, opacity=opac)
    img_ref, alpha_ref = rasterize_binned(
        proj.mean2d, proj.conic, colors, opac, binned, H, W, bg, CFG,
        compositor=composite_tiles,
    )
    img, alpha, plan = run_sorted(proj, colors, opac, bg)
    assert int(plan.budget_overflow) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref), atol=1e-5)


def test_sorted_counts_match_binned():
    scene = make_scene(seed=1)
    proj, opac, colors, cam = screen_inputs(scene)
    big = dataclasses.replace(CFG, max_tiles_per_gaussian=16)
    binned = bin_gaussians(proj, H, W, big, opacity=opac)
    _img, _alpha, plan = run_sorted(proj, colors, opac, jnp.zeros(3))
    np.testing.assert_array_equal(
        np.asarray(plan.counts), np.asarray(binned.counts)
    )
    starts = np.asarray(plan.tile_starts)
    counts = np.asarray(plan.counts)
    np.testing.assert_array_equal(starts[1:], starts[:-1] + counts[:-1])
    assert int(plan.total) == int(starts[-1] + counts[-1])
    pos = np.asarray(plan.pos)
    assert len(np.unique(pos)) == pos.shape[0]   # a permutation


def test_sorted_handles_hot_tiles():
    # No per-tile capacity: a heavily overlapped tile must match a
    # big-capacity table reference exactly.
    scene = make_scene(n=400, seed=2, opac_lo=0.4, opac_hi=0.7)
    means, scales, quats, opacity, colors, cam = scene
    means = means.at[:, :2].multiply(0.05)
    proj = project_from_params(means, scales, quats, cam)
    opac = jnp.where(proj.mask, opacity, 0.0)
    bg = jnp.zeros(3)

    big = dataclasses.replace(CFG, capacity=512)
    binned = bin_gaussians(proj, H, W, big, opacity=opac)
    assert int(binned.overflow) == 0
    img_ref, _ = rasterize_binned(
        proj.mean2d, proj.conic, colors, opac, binned, H, W, bg, big,
        compositor=composite_tiles,
    )
    img, _alpha, plan = run_sorted(proj, colors, opac, bg)
    assert int(plan.budget_overflow) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=1e-5)


def test_sorted_grad_parity():
    scene = make_scene(seed=3, opac_hi=0.95)
    proj, opac, colors, cam = screen_inputs(scene)
    bg = jnp.array([0.5, 0.4, 0.3])
    wimg = jax.random.normal(jax.random.PRNGKey(9), (H, W, 3))
    walpha = jax.random.normal(jax.random.PRNGKey(10), (H, W))

    binned = bin_gaussians(proj, H, W, CFG, opacity=opac)

    def loss_ref(m2d, conic, col, op):
        img, alpha = rasterize_binned(
            m2d, conic, col, op, binned, H, W, bg, CFG, compositor=composite_tiles
        )
        return jnp.sum(img * wimg) + jnp.sum(alpha * walpha)

    def loss_sorted(m2d, conic, col, op):
        p2 = proj._replace(mean2d=m2d, conic=conic)
        img, alpha, _plan = run_sorted(p2, col, op, bg)
        return jnp.sum(img * wimg) + jnp.sum(alpha * walpha)

    args = (proj.mean2d, proj.conic, colors, opac)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_new = jax.grad(loss_sorted, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_new, g_ref, ["mean2d", "conic", "color", "opac"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_budget_overflow_and_growth():
    # Tiny budgets: big splats lose bbox tiles, counted in budget_overflow;
    # grow_tiers raises the top budget until the frame fits.
    scene = make_scene(n=200, seed=6, opac_lo=0.8, opac_hi=0.95)
    proj, opac, colors, cam = screen_inputs(scene)
    tiny = TierSpec(base=1, tiers=())
    _img, _a, plan = rasterize_sorted(
        proj, colors, opac, H, W, jnp.zeros(3), CFG.tile_h, CFG.tile_w, tiny
    )
    assert int(plan.budget_overflow) > 0
    grown = grow_tiers(tiny, int(plan.max_footprint))
    assert grown.max_budget() >= min(2, int(plan.max_footprint))
    for _ in range(8):
        _img, _a, plan = rasterize_sorted(
            proj, colors, opac, H, W, jnp.zeros(3), CFG.tile_h, CFG.tile_w, grown
        )
        if int(plan.budget_overflow) == 0:
            break
        grown = grow_tiers(grown, int(plan.max_footprint))
    assert int(plan.budget_overflow) == 0


def test_default_tiers_shapes():
    spec = default_tiers(98304)
    assert spec.base == 2
    assert all(c % 128 == 0 for c, _ in spec.tiers)
    assert spec.max_budget() == 64
    # tier counts non-increasing, budgets increasing
    counts = [c for c, _ in spec.tiers]
    assert counts == sorted(counts, reverse=True)


def test_render_tiled_sorted_mode_matches_scan():
    scene = make_scene(seed=4)
    means, scales, quats, opacity, colors, cam = scene
    bg = jnp.array([0.0, 0.0, 0.0])
    sh = jnp.concatenate([colors[:, None, :], jnp.zeros((colors.shape[0], 15, 3))], 1)
    out_scan = render_tiled(
        means, scales, quats, opacity, cam, bg, sh=sh, sh_degree=3,
        cfg=CFG, use_pallas=False,
    )
    # Same bbox truncation as the reference config (budget 16 for all).
    cfg_s = dataclasses.replace(CFG, tiers=((512, 16),))
    out_sorted = render_tiled(
        means, scales, quats, opacity, cam, bg, sh=sh, sh_degree=3,
        cfg=cfg_s, use_pallas=True, sorted_data=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_sorted.color), np.asarray(out_scan.color), atol=1e-5
    )


def test_wide_bbox_row_split_exact():
    """Regression: dy = j // bw must be exact for wide bboxes (bw >= 41).

    The former floor(j * float32(1/bw)) put slot j = k*bw one row early for
    many widths (smallest failing bw = 41), binning the slot to a tile
    outside the bbox and silently dropping the true tile (k, 0)."""
    from gaussianavatars_tpu.ops.sort_binning import sort_bin_forward

    i32, f32 = jnp.int32, jnp.float32
    n, ntx, nty = 128, 64, 4
    nt = ntx * nty
    for bw_v in (41, 47, 55, 61, 82):
        rows = 2 if bw_v <= 64 else 1
        ntiles = bw_v * rows
        spec = TierSpec(base=2, tiers=((128, ntiles + 2),))
        tminx = jnp.zeros((n,), i32)
        tminy = jnp.zeros((n,), i32)
        bw = jnp.full((n,), bw_v, i32)
        ntiles_eff = jnp.zeros((n,), i32).at[0].set(ntiles)
        depth_bits = jnp.arange(n, dtype=i32)
        data_cols = [jnp.arange(n, dtype=f32)] * 9
        s_data, s_tile, s_pos, gidx_fp, overflow = jax.jit(
            sort_bin_forward, static_argnums=(6, 7, 8)
        )(data_cols, tminx, tminy, bw, ntiles_eff, depth_bits, ntx, nt, spec)
        assert int(overflow) == 0
        live = np.asarray(s_tile)
        live = live[live < nt]
        expect = np.sort(
            np.array([(j // bw_v) * ntx + (j % bw_v) for j in range(ntiles)])
        )
        np.testing.assert_array_equal(np.sort(live), expect), bw_v
