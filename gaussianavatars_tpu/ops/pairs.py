"""Pair-layout tile binning: capacity-free, early-exit-friendly (TPU-native).

The production layout for the tiled rasterizer. Where `bin_gaussians`
(`ops/rasterize_tiled.py`) builds a dense, padded ``[num_tiles, capacity]``
index table — whose capacity both caps correctness and multiplies HBM
traffic — this module keeps the sorted (tile, depth) pair list itself as the
compositing order, exactly like the CUDA rasterizer the reference depends on
(its `ranges`/`point_list` arrays; call site `gaussian_renderer/__init__.py:86-94`):

  * pairs are expanded and depth-sorted per tile (`expand_sorted_pairs`);
    every valid pair lands in the sorted prefix (invalid/padding pairs carry
    sentinel keys and sink to the end),
  * each tile's pairs form one contiguous segment [start, start+count) of
    the sorted array — kept **unaligned**; the Pallas compositor
    (`ops/pallas/composite_pairs.py`) rounds its window down to the 128-lane
    DMA boundary and masks the head slots, so no re-layout pass is needed,
  * the compositor walks its segment in fixed-size DMA chunks and stops at
    per-pixel saturation — a tile with 13k overlapping splats costs only
    the ~hundreds actually composited before transmittance dies.

There is **no per-tile capacity**: any number of Gaussians per tile is
correct. The only static budgets are the per-Gaussian tile budget
(`TileConfig.max_tiles_per_gaussian`, reported via ``budget_overflow``) and
the total sorted-pair capacity ``pair_cap`` (reported via ``overflow``);
both are observable and growable by the training loop's re-trace machinery.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import Projected
from .rasterize_tiled import TileConfig, expand_sorted_pairs

# Kernel DMA chunks are 128-lane aligned; pair_cap must be a multiple.
ALIGN = 128
# Pairs per kernel DMA chunk; data arrays carry one chunk of slack so the
# last (rounded-up) chunk of a segment can never read past the allocation.
PAIR_CHUNK = 512


class PairBins(NamedTuple):
    """Sorted-pair binning (see module docstring)."""

    gidx: jnp.ndarray         # [pair_cap] int32 Gaussian index per sorted pair
    #     (slots ≥ `total` are junk — masked by callers via `total`)
    pos: Optional[jnp.ndarray]  # [pair_cap] int32 pre-sort expansion position
    #     (a slice of a permutation — unique); None unless with_pos
    tile_starts: jnp.ndarray  # [NT] int32 segment start per tile (unaligned)
    counts: jnp.ndarray       # [NT] int32 live pairs per tile (clamped to cap)
    total: jnp.ndarray        # [] int32 valid pairs in the sorted prefix
    overflow: jnp.ndarray     # [] int32 pairs lost because pair_cap is too small
    budget_overflow: jnp.ndarray  # [] int32 pairs dropped by the per-Gaussian
    #     max_tiles_per_gaussian bbox budget
    n_expand: int             # static: expansion size M (for grad un-permutation)
    big_idx: Optional[jnp.ndarray] = None  # [nb] int32 Gaussian index per
    #     big-class row (two-class binning only; see `expand_sorted_pairs`)
    small_budget: int = 0     # static: small-class budget (two-class only)


def default_pair_cap(n_gauss: int, cfg: TileConfig) -> int:
    """A pair_cap that can never overflow: the full expansion size."""
    nb = min(cfg.big_slots, n_gauss)
    if nb > 0:
        m_exp = n_gauss * cfg.small_budget + nb * cfg.max_tiles_per_gaussian
    else:
        m_exp = n_gauss * cfg.max_tiles_per_gaussian
    return -(-m_exp // ALIGN) * ALIGN


def bin_pairs(
    proj: Projected,
    height: int,
    width: int,
    cfg: TileConfig,
    opacity: Optional[jnp.ndarray] = None,
    with_pos: bool = False,
    pair_cap: Optional[int] = None,
) -> PairBins:
    """Bin Gaussians into the sorted pair layout.

    All integer bookkeeping — callers wrap in stop_gradient. ``with_pos``
    additionally carries each pair's pre-sort expansion position through the
    sort (needed by the backward's gradient un-permutation; skip for
    render-only to shrink the sort payload). ``pair_cap`` truncates the
    kept prefix (smaller = cheaper parameter gather; truncation is counted
    in ``overflow`` — grow and re-trace to recover).
    """
    s_tile, s_gidx, s_pos, pair_drops, nt, ntx, big_idx = expand_sorted_pairs(
        proj, height, width, cfg, opacity=opacity, with_pos=with_pos
    )
    m_exp = s_gidx.shape[0]
    if pair_cap is None:
        pair_cap = -(-m_exp // ALIGN) * ALIGN
    assert pair_cap % ALIGN == 0, "pair_cap must be 128-aligned"
    pair_cap = min(pair_cap, -(-m_exp // ALIGN) * ALIGN)

    i32 = jnp.int32
    tile_ids = jnp.arange(nt, dtype=i32)
    starts = jnp.searchsorted(s_tile, tile_ids, side="left").astype(i32)
    ends = jnp.searchsorted(s_tile, tile_ids, side="right").astype(i32)
    total = ends[-1] if nt > 0 else jnp.zeros((), i32)
    overflow = jnp.maximum(total - pair_cap, 0)
    # Clamp segments to the kept prefix (lost pairs are in `overflow`).
    starts_c = jnp.minimum(starts, pair_cap)
    counts = jnp.maximum(jnp.minimum(ends, pair_cap) - starts_c, 0)

    if m_exp > pair_cap:
        s_gidx = s_gidx[:pair_cap]
    elif pair_cap > m_exp:
        s_gidx = jnp.pad(s_gidx, (0, pair_cap - m_exp))
    if s_pos is not None and s_pos.shape[0] < pair_cap:
        # pos keeps FULL expansion length (padded with fresh unique values):
        # the backward un-permute sorts (pos, gradients) so dropped pairs'
        # zero gradients still land on their expansion rows.
        s_pos = jnp.concatenate(
            [s_pos, m_exp + jnp.arange(pair_cap - m_exp, dtype=i32)]
        )

    return PairBins(
        gidx=s_gidx, pos=s_pos, tile_starts=starts_c, counts=counts,
        total=jnp.minimum(total, pair_cap), overflow=overflow,
        budget_overflow=jnp.sum(pair_drops), n_expand=m_exp,
        big_idx=big_idx,
        small_budget=cfg.small_budget if big_idx is not None else 0,
    )


def pairs_to_table(bins: PairBins, capacity: int) -> jnp.ndarray:
    """[NT, capacity] index table equivalent of the pair layout (slots past
    a tile's count = -1). Test/CPU utility bridging to `rasterize_binned`;
    capacity must cover max(counts) or the table silently truncates."""
    cap = bins.gidx.shape[0]
    take = bins.tile_starts[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    in_seg = jnp.arange(capacity, dtype=jnp.int32)[None, :] < bins.counts[:, None]
    return jnp.where(in_seg, bins.gidx[jnp.clip(take, 0, cap - 1)], -1)
