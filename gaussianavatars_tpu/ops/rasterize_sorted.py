"""Sorted-data rasterization pipeline (production TPU path, round 4).

Replaces the round-3 gather-based front end with the
data-carrying sort of `ops/sort_binning.py` and composites with the same
chunked-DMA Pallas kernels (`ops/pallas/composite_pairs.py`). One custom
VJP (`sort_gather`) spans the whole binning:

  forward:  footprint sort → tiered expansion → (tile, depth) pair sort
            → param-major [16, M + chunk] table, segment starts/counts.
  backward: un-permute sort by the saved column-major `pos` → per-Gaussian
            reduction as 128-aligned contiguous slice adds → un-permute
            sort by the saved footprint order → per-Gaussian gradients.

Cost (measured v5e, 92k-splat avatar at 802×550): the whole forward
binning ≈ 2.5 ms vs 9.2 ms for the round-3 sort+gather pipeline; the
backward reduction ≈ 2 ms vs 8.4 ms for the full-expansion un-permute.
Semantics match `ops/rasterize_dense.py` (the tested ground truth) and the
CUDA rasterizer the reference builds on — exact (tile, depth)-keyed
front-to-back order, 1/255 cutoff, 0.99 clamp, T < 1e-4 early stop
(`gaussian_renderer/__init__.py:86-94`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp

from .sort_binning import (
    ALIGN,
    PAIR_CHUNK,
    SortPlan,
    TierSpec,
    bbox_tiles,
    reduce_expansion,
    segment_bounds,
    sort_bin_forward,
)
from .pallas.composite_pairs import bwd_call_pairs, fwd_call_pairs


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# ---------------------------------------------------------------------------
# sort_gather: the differentiable binning seam
# ---------------------------------------------------------------------------


def _sg_fwd_impl(geom, mean2d, conic, colors, opacity, ints):
    nt, ntx, spec = geom
    tminx, tminy, bw, ntiles_eff, depth_bits = ints
    mask_f = (ntiles_eff > 0)[:, None].astype(mean2d.dtype)
    # Finite data for dead rows (sentinel keys sort them out, but NaNs in
    # payload columns must not reach the sort).
    mean2d = mean2d * mask_f
    conic = conic * mask_f
    colors = colors * mask_f
    opacity = opacity * mask_f[:, 0]
    # 128-align the Gaussian axis (the backward's slice reduction works on
    # [M/128, 128] rows); production capacities are already aligned.
    n = opacity.shape[0]
    pad = (-n) % ALIGN
    if pad:
        padi = lambda x: jnp.pad(x, (0, pad))
        mean2d = jnp.pad(mean2d, ((0, pad), (0, 0)))
        conic = jnp.pad(conic, ((0, pad), (0, 0)))
        colors = jnp.pad(colors, ((0, pad), (0, 0)))
        opacity = padi(opacity)
        tminx, tminy, bw, ntiles_eff, depth_bits = (
            padi(tminx), padi(tminy), padi(bw), padi(ntiles_eff),
            padi(depth_bits),
        )
    cols = (
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        colors[:, 0], colors[:, 1], colors[:, 2],
        opacity,
    )
    s_data, s_tile, s_pos, gidx_fp, budget_overflow = sort_bin_forward(
        cols, tminx, tminy, bw, ntiles_eff, depth_bits, ntx, nt, spec
    )
    starts, counts, total = segment_bounds(s_tile, nt)
    m = s_tile.shape[0]
    # Param-major table with one chunk of DMA slack (7 zero pad rows).
    padded = [jnp.pad(x, (0, PAIR_CHUNK)) for x in s_data]
    zero = jnp.zeros((m + PAIR_CHUNK,), s_data[0].dtype)
    dataT = jnp.stack(list(padded) + [zero] * 7, axis=0)
    plan = SortPlan(
        tile_starts=starts, counts=counts, total=total,
        budget_overflow=budget_overflow,
        max_footprint=jnp.max(ntiles_eff),
        pos=s_pos, gidx_fp=gidx_fp,
    )
    return dataT, plan


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def sort_gather(geom, mean2d, conic, colors, opacity, ints):
    """geom = (nt, ntx, TierSpec) static; ints = non-diff bbox/depth keys.

    Returns (dataT [16, M+chunk] param-major sorted pair table, SortPlan).
    """
    return _sg_fwd_impl(geom, mean2d, conic, colors, opacity, ints)


def _sg_fwd(geom, mean2d, conic, colors, opacity, ints):
    dataT, plan = _sg_fwd_impl(geom, mean2d, conic, colors, opacity, ints)
    return (dataT, plan), (plan.pos, plan.gidx_fp, ints)


def _sg_bwd(geom, res, cot):
    nt, ntx, spec = geom
    pos, gidx_fp, ints = res
    d_dataT, _d_plan = cot
    n_out = ints[0].shape[0]       # caller's (possibly unaligned) count
    n = gidx_fp.shape[0]           # 128-aligned internal count
    m = pos.shape[0]
    # The backward kernel zero-fills every slot it owns and the caller
    # zero-initialises the rest (input_output_aliases), so no validity mask
    # is needed here.
    d_cols = tuple(d_dataT[i, :m] for i in range(9))
    # 1. un-permute to the column-major expansion layout.
    r = jax.lax.sort((pos,) + d_cols, num_keys=1)
    # 2. reduce tier blocks: contiguous 128-row slice adds.
    acc = reduce_expansion(r[1:], n, spec)
    # 3. un-permute the footprint ordering back to Gaussian order.
    rr = jax.lax.sort((gidx_fp,) + tuple(acc), num_keys=1)
    g = [x[:n_out] for x in rr[1:]]
    d_mean2d = jnp.stack([g[0], g[1]], axis=-1)
    d_conic = jnp.stack([g[2], g[3], g[4]], axis=-1)
    d_colors = jnp.stack([g[5], g[6], g[7]], axis=-1)
    d_opacity = g[8]
    return (
        d_mean2d, d_conic, d_colors, d_opacity,
        jax.tree_util.tree_map(_float0_like, ints),
    )


sort_gather.defvjp(_sg_fwd, _sg_bwd)


# ---------------------------------------------------------------------------
# composite: same Pallas kernels, zero-initialised gradient table
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_sorted(geom, dataT, starts, counts):
    """geom = (tile_h, tile_w, ntx, amp) static.

    Returns (acc [NT, P, 3] premultiplied colour, t_final [NT, P])."""
    th, tw, ntx = geom[:3]
    acc, tfin, _stop = fwd_call_pairs(dataT, starts, counts, th, tw, ntx)
    return jnp.moveaxis(acc, 1, 2), tfin


def _cs_fwd(geom, dataT, starts, counts):
    th, tw, ntx = geom[:3]
    acc, tfin, stop = fwd_call_pairs(dataT, starts, counts, th, tw, ntx)
    return (jnp.moveaxis(acc, 1, 2), tfin), (dataT, starts, counts, acc, tfin, stop)


def _cs_bwd(geom, res, cot):
    th, tw, ntx = geom[:3]
    amp = bool(geom[3]) if len(geom) > 3 else False
    dataT, starts, counts, acc, tfin, stop = res
    g_acc_t, g_t = cot
    d_dataT = bwd_call_pairs(
        dataT, starts, counts, acc, tfin, stop, g_acc_t, g_t, th, tw, ntx,
        amp=amp,
    )
    return d_dataT, _float0_like(starts), _float0_like(counts)


composite_sorted.defvjp(_cs_fwd, _cs_bwd)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def rasterize_sorted(
    proj,                      # Projected (differentiable mean2d/conic used)
    colors: jnp.ndarray,       # [N, 3]
    opacity: jnp.ndarray,      # [N] (0 for masked)
    height: int,
    width: int,
    bg_color: jnp.ndarray,
    tile_h: int,
    tile_w: int,
    spec: TierSpec,
    amp: bool = False,
):
    """Bin with the data-carrying sort and composite. Differentiable w.r.t.
    mean2d/conic/colors/opacity. Returns (color [H,W,3], alpha [H,W], plan).
    """
    sg = jax.lax.stop_gradient
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    nt = nty * ntx

    proj_sg = jax.tree_util.tree_map(sg, proj)
    tminx, tminy, bw, ntiles, _nty, _ntx = bbox_tiles(
        proj_sg, height, width, tile_h, tile_w, opacity=sg(opacity)
    )
    ntiles_eff = jnp.where(proj_sg.mask, ntiles, 0)
    # Positive-float bitcast is strictly increasing on positives (depths are
    # near-culled > 0), giving the exact CUDA-style (tile | depth bits) order.
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj_sg.depth, 1e-20).astype(jnp.float32), jnp.int32
    )
    ints = (tminx, tminy, bw, ntiles_eff, depth_bits)

    dataT, plan = sort_gather(
        (nt, ntx, spec), proj.mean2d, proj.conic, colors, opacity, ints
    )
    acc, t_final = composite_sorted(
        (tile_h, tile_w, ntx, amp),
        dataT, sg(plan.tile_starts), sg(plan.counts),
    )
    out = acc + t_final[..., None] * bg_color[None, None, :]

    img = out.reshape(nty, ntx, tile_h, tile_w, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * tile_h, ntx * tile_w, 3)[:height, :width]
    alpha = (1.0 - t_final).reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
    alpha = alpha.reshape(nty * tile_h, ntx * tile_w)[:height, :width]
    return img, alpha, plan
