"""Data-carrying sort binning: the gather-free rasterizer front end.

Round-3 profiling showed the pair pipeline spends ~3× more on binning
bookkeeping than on compositing: a (key, gidx, pos) sort over the padded
expansion, a 458k-row XLA gather to build the kernel's pair-parameter table,
and a full-expansion un-permute sort in the backward. This module removes
the gather entirely and shrinks every sort, exploiting two measured facts
about `jax.lax.sort` on TPU (microbenchmarks, v5e):

  * payload width is almost free — sorting (key, pos, 9 floats) costs the
    same as (key, gidx, pos), so the screen-space parameters can ride the
    binning sort as payload and land pre-gathered in sorted-pair order;
  * sort cost is linear in slot count — so a *tiered* budget expansion
    (every Gaussian gets a small base budget; only the footprint-heaviest
    get progressively larger ones) cuts the expansion ~3× vs the two-class
    layout with no correctness change (drops are counted, as before).

Pipeline (all integer keys under stop_gradient; data differentiable through
a single custom VJP, `sort_gather` in `ops/rasterize_sorted.py`):

  1. **Footprint sort** over the N Gaussians: key = −(clipped tile count);
     ALL per-Gaussian columns (screen params + bbox ints + depth bits +
     original index) ride as payload. After this, every budget tier is a
     contiguous *prefix slice* — no gathers anywhere.
  2. **Tiered expansion**, Gaussian-major [n_tier, budget_range] blocks
     (compile-friendly orientation on TPU). Slot j of Gaussian g covers
     bbox tile j; rows beyond the bbox get the sentinel tile key NT. Each
     row's `pos` payload encodes a COLUMN-MAJOR destination, so the
     backward's un-permute sort lands gradients where the per-Gaussian
     reduction is a handful of 128-aligned contiguous vector adds.
  3. **Pair sort**, two keys (tile, depth-bits — positive-float bitcast is
     order-preserving, so depth ordering is exact like the CUDA radix sort
     over (tile, depth) keys that the reference relies on,
     `gaussian_renderer/__init__.py:86-94`) with the 9 data columns + pos
     as payload.
  4. Segment starts/counts by `searchsorted`; the param-major [16, M+pad]
     table for the Pallas compositors by one stack.

There is NO pair capacity and no per-tile capacity: the expansion size M is
a static function of the tier spec, every live pair is kept, and the only
loss mode is the per-Gaussian budget (counted in ``budget_overflow``, grown
by the training loop's re-trace machinery).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .projection import Projected
from .rasterize_dense import ALPHA_CUTOFF

# Kernel DMA chunks are 128-lane aligned; tier counts and the expansion size
# must be multiples so backward row-slices stay aligned.
ALIGN = 128
PAIR_CHUNK = 512


@dataclasses.dataclass(frozen=True)
class TierSpec:
    """Static tiered-budget spec (part of the jit cache key).

    Every Gaussian gets ``base`` expansion slots. The ``tiers`` are
    (count, budget) pairs with strictly increasing budgets: the `count`
    footprint-heaviest Gaussians additionally get slots up to `budget`.
    Counts must be multiples of 128 and non-increasing (tier c+1 members
    are a subset of tier c by construction of the footprint order).
    """

    base: int = 2
    tiers: tuple[tuple[int, int], ...] = ()

    def __post_init__(self):
        prev_b = self.base
        prev_c = None
        for c, b in self.tiers:
            assert c % ALIGN == 0, f"tier count {c} must be 128-aligned"
            assert b > prev_b, "tier budgets must be strictly increasing"
            assert prev_c is None or c <= prev_c, (
                "tier counts must be non-increasing"
            )
            prev_b, prev_c = b, c

    def blocks(self, n: int) -> list[tuple[int, int, int]]:
        """(n_rows, j0, j1) per expansion block, in layout order."""
        out = [(n, 0, self.base)]
        j0 = self.base
        for c, b in self.tiers:
            out.append((min(c, n), j0, b))
            j0 = b
        return out

    def expansion_size(self, n: int) -> int:
        return sum(nr * (j1 - j0) for nr, j0, j1 in self.blocks(n))

    def max_budget(self) -> int:
        return self.tiers[-1][1] if self.tiers else self.base

    def budget_for_rank(self, rank: jnp.ndarray) -> jnp.ndarray:
        """Per-Gaussian budget as a function of footprint-order position."""
        budget = jnp.full_like(rank, self.base)
        for c, b in self.tiers:
            budget = jnp.where(rank < c, b, budget)
        return budget


def default_tiers(capacity: int) -> TierSpec:
    """A generous default: ~5.1 slots/Gaussian, top tier budget 64.

    Sized so a trained avatar's footprint distribution (benchmark probe:
    ~17% of splats need >4 tiles, max ~49) fits with slack; a scene that
    still overflows reports ``budget_overflow`` and the training loop
    re-traces with `grow_tiers`.
    """
    r = lambda x: max(ALIGN, (int(x) // ALIGN) * ALIGN)
    return TierSpec(
        base=2,
        tiers=(
            (r(capacity / 4), 8),
            (r(capacity / 16), 24),
            (r(capacity / 64), 64),
        ),
    )


def probe_tiers(
    footprints,
    base: int = 2,
    margin: float = 1.3,
    ladder: Sequence[int] = (8, 24, 64, 128, 256, 512),
) -> TierSpec:
    """Size a TierSpec from a measured footprint distribution (zero
    truncation on the probe frame, with `margin` headroom for motion).

    `footprints` = per-Gaussian clipped bbox tile counts of one
    representative frame (`bbox_tiles` → masked ntiles). For each ladder
    budget, tier membership = the number of Gaussians whose footprint
    exceeds the previous budget, scaled by `margin` and 128-aligned; the
    ladder stops once the largest footprint (plus headroom) is covered.
    Used by bench.py and the training loop's init-time auto-probe so the
    DEFAULT configuration reproduces the benchmark's zero-overflow setup;
    mid-training drift beyond the margin is caught by ``budget_overflow``
    and `grow_tiers`."""
    import numpy as np

    fp = np.asarray(footprints)
    n = fp.shape[0]
    n_aligned = -(-n // ALIGN) * ALIGN
    fmax = int(fp.max()) if n else 0
    top_needed = int(fmax * margin) + 1
    tiers: list[tuple[int, int]] = []
    prev_b = base
    for b in ladder:
        if fmax <= prev_b:
            break
        cnt = int((fp > prev_b).sum() * margin)
        cnt = min(-(-max(cnt, 1) // ALIGN) * ALIGN, n_aligned)
        b_eff = min(b, top_needed)
        if b_eff <= prev_b:
            break
        tiers.append((cnt, b_eff))
        prev_b = b_eff
        if b_eff >= top_needed:
            break
    else:
        if fmax > prev_b:  # ladder exhausted below the max footprint
            cnt = int((fp > prev_b).sum() * margin)
            cnt = min(-(-max(cnt, 1) // ALIGN) * ALIGN, n_aligned)
            tiers.append((cnt, top_needed))
    # Counts non-increasing (TierSpec invariant).
    for i in range(len(tiers) - 2, -1, -1):
        tiers[i] = (max(tiers[i][0], tiers[i + 1][0]), tiers[i][1])
    return TierSpec(base=base, tiers=tuple(tiers))


def grow_tiers(
    spec: TierSpec, max_footprint: int, n_gauss: Optional[int] = None
) -> TierSpec:
    """Re-trace target after a budget overflow.

    Raises the top tier budget to cover the observed footprint and doubles
    every tier's membership count (clamped to the padded Gaussian count) —
    repeated application converges to "every Gaussian gets the full
    footprint budget", so zero overflow is always reachable.
    """
    top = spec.max_budget()
    new_top = max(top, int(max_footprint))
    cap = None
    if n_gauss is not None:
        cap = -(-int(n_gauss) // ALIGN) * ALIGN
    tiers = []
    for c, b in spec.tiers:
        c2 = c * 2
        if cap is not None:
            c2 = min(c2, cap)
        tiers.append((c2, b))
    if tiers:
        tiers[-1] = (tiers[-1][0], new_top)
    else:
        c0 = ALIGN if cap is None else min(max(ALIGN, cap // 4), cap)
        tiers = [(c0, max(new_top, 2 * spec.base))]
    # Re-normalise: counts non-increasing.
    for i in range(len(tiers) - 2, -1, -1):
        tiers[i] = (max(tiers[i][0], tiers[i + 1][0]), tiers[i][1])
    return dataclasses.replace(spec, tiers=tuple(tiers))


class SortPlan(NamedTuple):
    """Integer bookkeeping of one binned frame (all non-differentiable)."""

    tile_starts: jnp.ndarray    # [NT] i32 segment start per tile
    counts: jnp.ndarray         # [NT] i32 live pairs per tile
    total: jnp.ndarray          # [] i32 live pairs
    budget_overflow: jnp.ndarray  # [] i32 bbox tiles dropped by tier budgets
    max_footprint: jnp.ndarray  # [] i32 largest clipped bbox tile count
    pos: jnp.ndarray            # [M] i32 column-major destination per sorted row
    gidx_fp: jnp.ndarray        # [N] i32 original Gaussian index per fp row


def bbox_tiles(
    proj: Projected,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    opacity: Optional[jnp.ndarray] = None,
):
    """Per-Gaussian tile-space bbox (tminx, tminy, bw, ntiles, nty, ntx).

    Same math as `rasterize_tiled.expand_sorted_pairs`: with ``opacity``
    the bbox is the exact axis-aligned box of the alpha-cutoff ellipse
    intersected with the 3σ circle (bit-identical images, fewer pairs).
    """
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    mx = proj.mean2d[:, 0]
    my = proj.mean2d[:, 1]
    r = proj.radius.astype(jnp.float32)
    if opacity is not None:
        tau = 2.0 * jnp.log(
            jnp.maximum(opacity, ALPHA_CUTOFF) * (1.0 / ALPHA_CUTOFF)
        )
        hx = jnp.minimum(r, jnp.sqrt(tau * jnp.maximum(proj.cov2d[:, 0], 0.0)))
        hy = jnp.minimum(r, jnp.sqrt(tau * jnp.maximum(proj.cov2d[:, 2], 0.0)))
    else:
        hx = hy = r
    tminx = jnp.clip(jnp.floor((mx - hx) / tile_w).astype(jnp.int32), 0, ntx)
    tmaxx = jnp.clip(jnp.floor((mx + hx) / tile_w).astype(jnp.int32) + 1, 0, ntx)
    tminy = jnp.clip(jnp.floor((my - hy) / tile_h).astype(jnp.int32), 0, nty)
    tmaxy = jnp.clip(jnp.floor((my + hy) / tile_h).astype(jnp.int32) + 1, 0, nty)
    bw = tmaxx - tminx
    ntiles = bw * (tmaxy - tminy)
    return tminx, tminy, bw, ntiles, nty, ntx


def sort_bin_forward(
    data_cols: Sequence[jnp.ndarray],   # 9 × [N] f32 (mx my a b c r g b op)
    tminx: jnp.ndarray,
    tminy: jnp.ndarray,
    bw: jnp.ndarray,
    ntiles_eff: jnp.ndarray,            # [N] i32, 0 for masked Gaussians
    depth_bits: jnp.ndarray,            # [N] i32 monotone depth key
    ntx: int,
    nt: int,
    spec: TierSpec,
):
    """The forward binning: fp-sort → tiered expand → 2-key pair sort.

    Returns (sorted data cols 9 × [M], s_tile [M], pos [M], gidx_fp [N],
    budget_overflow []).
    """
    n = data_cols[0].shape[0]
    i32 = jnp.int32
    gidx = jnp.arange(n, dtype=i32)

    # 1. footprint sort (descending tile count): one wide sort, every
    #    column rides as payload so tiers become prefix slices.
    fp = jax.lax.sort(
        (-ntiles_eff, tminx, tminy, jnp.maximum(bw, 1), ntiles_eff,
         depth_bits, gidx) + tuple(data_cols),
        num_keys=1,
    )
    _, txs, tys, bws, nts, dbs, gidx_fp = fp[:7]
    ds = fp[7:]

    # Budget overflow: footprint beyond the tier budget at each fp rank.
    rank = jnp.arange(n, dtype=i32)
    budget = spec.budget_for_rank(rank)
    budget_overflow = jnp.sum(jnp.maximum(nts - budget, 0))

    # 2. tiered expansion, Gaussian-major blocks. `pos` encodes the
    #    COLUMN-MAJOR destination (j-major within each block) so the
    #    backward reduction is contiguous slice adds.
    tk_parts, db_parts, pos_parts = [], [], []
    d_parts: list[list[jnp.ndarray]] = [[] for _ in ds]
    off = 0
    for n_sel, j0, j1 in spec.blocks(n):
        nb = j1 - j0
        j = j0 + jnp.arange(nb, dtype=i32)[None, :]              # [1, nb]
        # Integer division: floor(j * float32(1/bw)) is NOT exact — the
        # rounded reciprocal puts the product just below an integer at
        # j = k·bw for many widths (smallest bw=41), which binned the slot
        # to a tile outside the bbox and dropped the true tile entirely.
        dy = j // bws[:n_sel, None]
        dx = j - dy * bws[:n_sel, None]
        t_ = (tys[:n_sel, None] + dy) * ntx + (txs[:n_sel, None] + dx)
        valid = j < nts[:n_sel, None]
        tk_parts.append(jnp.where(valid, t_, nt).reshape(-1))
        db_parts.append(
            jnp.broadcast_to(dbs[:n_sel, None], (n_sel, nb)).reshape(-1)
        )
        # destination (column-major): off + (j − j0)·n_sel + g
        g_col = jnp.arange(n_sel, dtype=i32)[:, None]
        pos_parts.append(
            (off + (j - j0) * n_sel + g_col).reshape(-1)
        )
        for i, col in enumerate(ds):
            d_parts[i].append(
                jnp.broadcast_to(col[:n_sel, None], (n_sel, nb)).reshape(-1)
            )
        off += n_sel * nb

    tk = jnp.concatenate(tk_parts)
    db = jnp.concatenate(db_parts)
    pos = jnp.concatenate(pos_parts)
    dats = tuple(jnp.concatenate(p) for p in d_parts)

    # 3. pair sort: (tile, depth) exact two-key order, data as payload.
    r = jax.lax.sort((tk, db, pos) + dats, num_keys=2)
    s_tile, s_pos = r[0], r[2]
    s_data = r[3:]
    return s_data, s_tile, s_pos, gidx_fp, budget_overflow


def segment_bounds(s_tile: jnp.ndarray, nt: int):
    i32 = jnp.int32
    tids = jnp.arange(nt, dtype=i32)
    starts = jnp.searchsorted(s_tile, tids, side="left").astype(i32)
    ends = jnp.searchsorted(s_tile, tids, side="right").astype(i32)
    counts = ends - starts
    total = ends[-1] if nt > 0 else jnp.zeros((), i32)
    return starts, counts, total


def reduce_expansion(cols: Sequence[jnp.ndarray], n: int, spec: TierSpec):
    """Transpose of the tiered broadcast: column-major expansion gradients
    [M] → per-Gaussian sums [N] (fp order). All slices are 128-aligned
    contiguous rows in the [M/128, 128] view — pure vector adds."""
    outs = []
    for x in cols:
        x2 = x.reshape(-1, ALIGN)
        acc = None
        off = 0
        for n_sel, j0, j1 in spec.blocks(n):
            nrow = n_sel // ALIGN
            blk = None
            for j in range(j1 - j0):
                r0 = off // ALIGN + j * nrow
                piece = x2[r0:r0 + nrow]
                blk = piece if blk is None else blk + piece
            if acc is None:
                acc = blk
            else:
                acc = jnp.concatenate([acc[:nrow] + blk, acc[nrow:]], axis=0)
            off += n_sel * (j1 - j0)
        outs.append(acc.reshape(-1))
    return outs
