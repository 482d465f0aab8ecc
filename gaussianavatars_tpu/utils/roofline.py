"""Speed-of-light model for the splatting hot path (BASELINE.md:32 framing).

Makes the "% of speed-of-light" claim falsifiable: a bytes-and-FLOPs model
of each stage of the tiled rasterizer at a given scene occupancy, against
the chip's published/measured primitive rates. `bench.py` evaluates it on
the benchmark scene and reports measured/SoL.

The model (counts audited against `ops/pallas/composite_pairs.py` and
`ops/rasterize_tiled.py`):

  * **Compositing fwd** — per (slot, pixel) pair: dx/dy (2), quadratic form
    (7), exp (≈4 VPU slots), alpha clamp+cutoff tests (4), stop/contrib
    selects (5), weight+transmittance update (4), three colour FMAs (6) ≈
    **32 VPU flops/pair**. Pairs = Σ_tiles min(count, capacity)·P — the
    while_loop is count-bounded, so SoL uses actual occupancy, not
    capacity. (An early-exit bound would be tighter; treat this SoL as a
    lower bound on achievable.)
  * **Compositing bwd (moments kernel)** — the sequential replay does the
    alpha recompute (13) + suffix/d_alpha chain (12) + masks/selects (6) +
    weight stack (2) ≈ **33 VPU flops/pair**, plus two MXU contractions
    ([K,P]×[P,8] and [K,P]×[P,3]: 22 MACs/pair — negligible next to the
    MXU's capability, so the bwd is VPU-recurrence-bound too.
  * **Binning** — `lax.sort` of (key, payload) pairs: measured 2.2 ms per
    million pairs on v5e (an empirical primitive rate — XLA's sort is not
    HBM-bound). Pairs = N · avg tiles/Gaussian (budgeted).
  * **Gathers** — XLA TPU row gather costs ~17 ns/row regardless of row
    width (measured); the fwd pipeline does one [pairs_slots] row gather of
    the packed 9-float screen table.
  * **HBM floor** — tables in/out per stage at 819 GB/s; at this workload
    every stage is compute/latency-bound, the HBM floor is reported for
    completeness.

VPU rate: v5e TensorCore VPU = (8 sublanes × 128 lanes) × 4 ALUs
× 0.94 GHz ≈ 3.9 Tflop/s f32 (public architecture description; the MXU's
197 Tflop/s bf16 does not apply to elementwise work).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str = "v5e"
    vpu_flops: float = 3.9e12        # f32 elementwise, per chip
    mxu_flops: float = 1.97e14       # bf16
    hbm_bw: float = 8.19e11          # bytes/s
    sort_s_per_pair: float = 2.2e-9  # measured lax.sort rate on v5e
    gather_s_per_row: float = 17e-9  # measured XLA row-gather rate (in-graph)
    wide_sort_s_per_pair: float = 6.4e-9  # measured (key + 9 payload) sort
    # Round-4 re-measured rates (fori_loop-chained protocol, no dispatch
    # overlap — the r3 rates above conflated dispatch pipelining):
    # one wide `lax.sort` (key + ≤11 payloads; payload width is ~free).
    wsort_s_per_slot: float = 3.3e-9
    # two-key (tile, depth-bits) wide sort.
    wsort2_s_per_slot: float = 3.7e-9
    # 10-column stack into the param-major kernel table.
    stack_s_per_slot: float = 1.7e-9


FWD_FLOPS_PER_PAIR = 32.0
BWD_FLOPS_PER_PAIR = 33.0


def compositor_roofline(
    counts: np.ndarray,
    capacity: int,
    tile_pixels: int,
    n_gauss: int,
    tiles_per_gauss: float,
    height: int,
    width: int,
    chip: ChipSpec = ChipSpec(),
    sort_pairs: float | None = None,
) -> Dict[str, float]:
    """Speed-of-light times for one fwd(+bwd) render at this occupancy.

    Args:
      counts: [NT] per-tile binned Gaussian counts (pre-cap).
      capacity: tile capacity (cap on the composited count).
      tile_pixels: pixels per tile.
      n_gauss: PADDED Gaussian capacity — the binning sort always covers
        the full padded pair list (sentinel keys for dead slots sort to
        the end), so the sort volume is capacity-based, not live-count
        based. Passing the live count would understate t_sort and inflate
        the SoL FPS.
      tiles_per_gauss: the static per-Gaussian tile BUDGET
        (TileConfig.max_tiles_per_gaussian) — same reasoning.
      height, width: image size (for Mpix/s conversion).
      sort_pairs: explicit sorted-pair count override (e.g. the tiered
        expansion size of the sorted-data pipeline).
    """
    counts = np.asarray(counts)
    pairs = float(np.minimum(counts, capacity).sum()) * tile_pixels
    if sort_pairs is None:
        sort_pairs = float(n_gauss) * tiles_per_gauss

    t_fwd_vpu = pairs * FWD_FLOPS_PER_PAIR / chip.vpu_flops
    t_bwd_vpu = pairs * BWD_FLOPS_PER_PAIR / chip.vpu_flops
    t_sort = sort_pairs * chip.sort_s_per_pair
    # One packed row gather feeds fwd; bwd re-reads the resident tables.
    gather_rows = float(np.minimum(counts, capacity).sum())
    t_gather = gather_rows * chip.gather_s_per_row
    # HBM floor: packed table [slots, 9]f32 in, image+grads out.
    slots = float(counts.shape[0]) * capacity
    bytes_moved = slots * 9 * 4 * 2 + height * width * 3 * 4 * 4
    t_hbm = bytes_moved / chip.hbm_bw

    t_render_sol = t_fwd_vpu + t_sort + t_gather           # render = fwd only
    t_train_sol = t_fwd_vpu + t_bwd_vpu + t_sort + 2 * t_gather
    mpix = height * width / 1e6
    return {
        "pairs": pairs,
        "t_fwd_vpu_ms": t_fwd_vpu * 1e3,
        "t_bwd_vpu_ms": t_bwd_vpu * 1e3,
        "t_sort_ms": t_sort * 1e3,
        "t_gather_ms": t_gather * 1e3,
        "t_hbm_floor_ms": t_hbm * 1e3,
        "sol_render_fps": 1.0 / t_render_sol,
        "sol_train_mpix_s": mpix / t_train_sol,
        "sol_train_iters_s": 1.0 / t_train_sol,
    }


def sorted_roofline(
    counts: np.ndarray,
    tile_pixels: int,
    n_gauss: int,
    n_expand: int,
    height: int,
    width: int,
    chip: ChipSpec = ChipSpec(),
) -> Dict[str, float]:
    """Speed-of-light model for the SORTED-DATA pipeline
    (`ops/sort_binning.py` + `ops/rasterize_sorted.py` +
    `ops/pallas/composite_pairs.py` v2 kernels) — the round-4 production
    path. Stage model (audited against the code; primitive rates measured
    on v5e with the chained-loop protocol):

      * binning — footprint sort over N (wide, 16 payloads) + tiered
        expansion/broadcast (HBM-bandwidth, ~10 columns) + the two-key
        (tile, depth-bits) pair sort over the expansion M with 10 payloads
        + the [16, M] stack. No gather anywhere.
      * fwd/bwd compositing — per (pair, pixel) VPU work; pairs =
        Σ counts · tile_pixels, an UPPER bound (the kernels early-exit on
        per-pixel saturation, so achieved time can beat this "SoL").
      * gradient reduction — un-permute sort over M (pos + 9 payloads) +
        contiguous slice adds (bandwidth) + un-permute sort over N.
    """
    counts = np.asarray(counts)
    pairs = float(counts.sum()) * tile_pixels

    t_fwd_vpu = pairs * FWD_FLOPS_PER_PAIR / chip.vpu_flops
    t_bwd_vpu = pairs * BWD_FLOPS_PER_PAIR / chip.vpu_flops
    t_fp_sort = float(n_gauss) * chip.wsort_s_per_slot
    t_expand = float(n_expand) * 10 * 4 * 2 / chip.hbm_bw
    t_pair_sort = float(n_expand) * chip.wsort2_s_per_slot
    t_stack = float(n_expand) * chip.stack_s_per_slot
    t_binning = t_fp_sort + t_expand + t_pair_sort + t_stack
    t_unperm_m = float(n_expand) * chip.wsort_s_per_slot
    t_reduce = float(n_expand) * 9 * 4 * 2 / chip.hbm_bw
    t_unperm_n = float(n_gauss) * chip.wsort_s_per_slot
    t_grad_reduce = t_unperm_m + t_reduce + t_unperm_n
    # HBM floor: data table in (fwd + bwd re-read) + grads out + images.
    bytes_moved = float(n_expand) * 16 * 4 * 3 + height * width * 3 * 4 * 4
    t_hbm = bytes_moved / chip.hbm_bw

    t_render_sol = t_fwd_vpu + t_binning
    t_train_sol = t_fwd_vpu + t_bwd_vpu + t_binning + t_grad_reduce
    mpix = height * width / 1e6
    return {
        "pairs": pairs,
        "t_fwd_vpu_ms": t_fwd_vpu * 1e3,
        "t_bwd_vpu_ms": t_bwd_vpu * 1e3,
        "t_binning_ms": t_binning * 1e3,
        "t_grad_reduce_ms": t_grad_reduce * 1e3,
        "t_hbm_floor_ms": t_hbm * 1e3,
        "sol_render_fps": 1.0 / t_render_sol,
        "sol_train_mpix_s": mpix / t_train_sol,
        "sol_train_iters_s": 1.0 / t_train_sol,
    }
