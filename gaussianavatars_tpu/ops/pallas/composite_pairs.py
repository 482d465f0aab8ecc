"""Pair-segment alpha-compositing Pallas kernels (forward + backward).

The production compositor for the pair-layout rasterizer (`ops/pairs.py`) —
the TPU equivalent of the CUDA tile kernels' ``ranges``/``point_list``
architecture (reference call site `gaussian_renderer/__init__.py:86-94`):
one grid program per image tile, walking the tile's contiguous segment of
the depth-sorted pair-parameter table in fixed ``_CHUNK``-pair DMA chunks,
with per-pixel front-to-back early termination. Unlike the padded-table
kernels in `composite.py`, nothing here scales with a per-tile capacity:

  * HBM traffic = pairs actually walked (the while loop exits as soon as
    every pixel's transmittance saturates), not tiles × capacity;
  * a tile with 13k overlapping splats is *correct* and costs only the
    few hundred front-most splats that survive the 1/255 alpha cutoff and
    the T < 1e-4 stop.

Pair parameters arrive param-major ([16, pair_cap + _CHUNK]: mx, my,
conic a/b/c, rgb, opacity, 7 pad rows) because Mosaic DMA slices must be
128-lane aligned — a [pairs, 16] row layout cannot be sliced. Segments are
NOT re-laid out to 128-boundaries; each kernel rounds its window down to
the previous boundary and masks the ≤127 head slots (they belong to the
previous tile). Each chunk is one DMA + one in-register [16, _CHUNK] →
[_CHUNK, 16] transpose, after which the per-slot math is identical to the
proven `composite.py` kernels (1/255 cutoff, 0.99 clamp, T < 1e-4 stop,
suffix-from-saved-total moments backward with MXU contractions). Parity is
tested against the scan compositor in tests/test_rasterize_pairs.py.

Gradient outputs are written pair-major by the backward kernel. Because
adjacent tiles share a 128-lane boundary block, each tile's first chunk
read-modify-writes that block (keeping the lanes owned by the previous
tile — segments are contiguous, so the boundary is exact); the grid runs
tiles in order and every chunk's out-DMA is awaited, so the merge is
race-free. Chunk-tail overruns write zero rows that the next tile either
overwrites or preserves through its own merge; the unwritten tail past the
last segment is masked by the caller (`ops/rasterize_pairs.pair_gather`).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rasterize_dense import ALPHA_CUTOFF, ALPHA_MAX, T_EPS
from .composite import _pixel_coords, _moment_basis, _row_contract

_CHUNK = 512   # pairs per DMA chunk (one [16, 512] slice, 32 KB)
_SUB = 64      # slots per unrolled inner group
STOP_NEVER = 0x3FFFFFFF   # per-pixel stop sentinel: "never terminated"


def _window(start, count):
    """DMA window for an unaligned segment: 128-aligned base, head offset,
    effective slot count (head + live)."""
    start_dn = pl.multiple_of((start // 128) * 128, 128)
    head = start - start_dn
    return start_dn, head, head + count


def _fwd_kernel_pairs(
    starts_ref,            # scalar-prefetch: [NT] i32 segment starts (unaligned)
    counts_ref,            # scalar-prefetch: [NT] i32 live pairs per tile
    data_ref,              # ANY [16, pair_cap + _CHUNK] param-major pair table
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, 1, P]
    stop_ref,              # out [1, 1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
):
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, x0, y0)

    start_dn, head, count_eff = _window(starts_ref[i], counts_ref[i])
    n_chunks = (count_eff + _CHUNK - 1) // _CHUNK
    groups = _CHUNK // _SUB

    def scoped(scratch_in, tr_ref, sem):
        ones = jnp.ones((1, rows, 128), jnp.float32)

        def chunk_body(carry):
            k, t, stop, a0, a1, a2, _alive = carry
            cp = pltpu.make_async_copy(
                data_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)], scratch_in, sem
            )
            cp.start()
            cp.wait()
            tr_ref[...] = jnp.transpose(scratch_in[...], (1, 0))
            base = k * _CHUNK

            def g_body(gc):
                g, t, stop, a0, a1, a2, _galive = gc
                sub = tr_ref[pl.ds(g * _SUB, _SUB), :]   # [64, 16]
                r = lambda v: v.reshape(_SUB, 1, 1)
                b = lambda v: r(v) * ones
                mx, my = r(sub[:, 0]), r(sub[:, 1])
                ca, cb, cc = b(sub[:, 2]), b(sub[:, 3]), b(sub[:, 4])
                c0, c1, c2 = b(sub[:, 5]), b(sub[:, 6]), b(sub[:, 7])
                op = r(sub[:, 8])
                dx = px[None] - mx
                dy = py[None] - my
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                # Window gate as a VECTOR compare (iota vs scalar): slots
                # below `head` belong to the previous tile, slots at or past
                # `count_eff` to the next. (Folding the same conditions in
                # as scalar-bool operands miscompiles on Mosaic; vector form
                # is validated by the skeleton test.)
                sid = (base + g * _SUB) + jax.lax.broadcasted_iota(
                    jnp.int32, (_SUB, 1, 1), 0
                )
                g_live = (sid >= head) & (sid < count_eff)
                use = (power <= 0.0) & (alpha >= ALPHA_CUTOFF) & g_live
                w0 = jnp.zeros_like(a0)
                w1 = jnp.zeros_like(a0)
                w2 = jnp.zeros_like(a0)
                for j in range(_SUB):
                    s = base + g * _SUB + j
                    running = s < stop   # early stop (stop init = never)
                    test_t = t * (1.0 - alpha[j])
                    trigger = use[j] & running & (test_t < T_EPS)
                    stop = jnp.where(trigger, s, stop)
                    contrib = use[j] & running & jnp.logical_not(trigger)
                    w = jnp.where(contrib, alpha[j] * t, 0.0)
                    w0 = w0 + w * c0[j]
                    w1 = w1 + w * c1[j]
                    w2 = w2 + w * c2[j]
                    t = jnp.where(contrib, test_t, t)
                # Early-exit flags are computed in the body and carried as
                # scalars — Mosaic while conditions must not do vector
                # reductions of their own.
                galive = jnp.max(stop) >= base + (g + 1) * _SUB
                return g + 1, t, stop, a0 + w0, a1 + w1, a2 + w2, galive

            def g_cond(gc):
                g, _t, _stop, _a0, _a1, _a2, galive = gc
                return (g < groups) & galive

            _g, t, stop, a0, a1, a2, _ = jax.lax.while_loop(
                g_cond, g_body,
                (jnp.int32(0), t, stop, a0, a1, a2, jnp.bool_(True)),
            )
            alive = jnp.max(stop) >= (k + 1) * _CHUNK
            return k + 1, t, stop, a0, a1, a2, alive

        def chunk_cond(carry):
            k, _t, _stop, _a0, _a1, _a2, alive = carry
            return (k < n_chunks) & alive

        zeros = jnp.zeros((rows, 128), jnp.float32)
        init = (
            jnp.int32(0),
            zeros + 1.0,
            # "never stopped" sentinel (static — a dynamic-scalar broadcast
            # init miscompiles; the live range is gated per-slot instead).
            jnp.full((rows, 128), STOP_NEVER, jnp.int32),
            zeros, zeros, zeros,
            jnp.bool_(True),
        )
        _k, t, stop, a0, a1, a2, _ = jax.lax.while_loop(chunk_cond, chunk_body, init)
        acc_ref[0, 0, :] = a0.reshape(p)
        acc_ref[0, 1, :] = a1.reshape(p)
        acc_ref[0, 2, :] = a2.reshape(p)
        tfin_ref[0, 0, :] = t.reshape(p)
        stop_ref[0, 0, :] = stop.reshape(p)

    pl.run_scoped(
        scoped,
        scratch_in=pltpu.VMEM((16, _CHUNK), jnp.float32),
        tr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _bwd_kernel_pairs(
    starts_ref,            # scalar-prefetch [NT] i32
    counts_ref,            # scalar-prefetch [NT] i32
    basis_ref,             # [rows, 128, 8] moment basis (tile-local)
    data_ref,              # ANY [16, pair_cap + _CHUNK]
    acc_ref,               # [1, 3, P] primal output
    tfin_ref,              # [1, 1, P]
    stop_ref,              # [1, 1, P] i32
    gacc_ref,              # [1, 3, P] cotangent of acc
    gacct_ref,             # [1, rows, 128, 3] same cotangent, matmul layout
    gt_ref,                # [1, 1, P] cotangent of t_final
    *maybe_init_and_out,   # [dginit_ref (ANY, aliased)] + dgrad_ref (ANY out)
    th: int,
    tw: int,
    ntx: int,
    amp: bool = False,
):
    """Moments backward over pair segments (see `composite._bwd_kernel_moments`
    for the math: polynomial moment contractions on the MXU replace all
    per-slot spatial reductions; tile-LOCAL coordinates keep the moment
    expansion from cancelling in f32).

    With `zero_init` (sorted-data pipeline) an extra aliased input ref
    precedes the output: the gradient table arrives zero-filled, so slots
    outside every tile window stay exact zeros and the caller needs no
    validity mask before its un-permute sort."""
    dgrad_ref = maybe_init_and_out[-1]
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, 0.0, 0.0)   # tile-local; means shifted below

    start_dn, head, count_eff = _window(starts_ref[i], counts_ref[i])

    t_final = tfin_ref[0, 0, :].reshape(rows, 128)
    stop = stop_ref[0, 0, :].reshape(rows, 128)
    a0 = acc_ref[0, 0, :].reshape(rows, 128)
    a1 = acc_ref[0, 1, :].reshape(rows, 128)
    a2 = acc_ref[0, 2, :].reshape(rows, 128)
    g0 = gacc_ref[0, 0, :].reshape(rows, 128)
    g1 = gacc_ref[0, 1, :].reshape(rows, 128)
    g2 = gacc_ref[0, 2, :].reshape(rows, 128)
    g_t = gt_ref[0, 0, :].reshape(rows, 128)
    gt_tf = g_t * t_final
    basis = basis_ref[...]
    gmat = gacct_ref[0]

    needed = jnp.minimum(count_eff, jnp.max(stop) + 1)
    n_chunks = (needed + _CHUNK - 1) // _CHUNK
    groups = _CHUNK // _SUB

    def scoped(scratch_in, tr_ref, dgr_ref, scratch_out, head_ref, sem_in, sem_out):
        ones = jnp.ones((1, rows, 128), jnp.float32)

        def chunk_body(k, carry):
            t, r0, r1, r2 = carry   # T before slot; residual a_c − prefix_{<s}
            cp = pltpu.make_async_copy(
                data_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)], scratch_in, sem_in
            )
            cp.start()
            # The boundary block this tile shares with the previous one:
            # fetched every chunk (cheap, 8 KB) but only merged for k == 0.
            cph = pltpu.make_async_copy(
                dgrad_ref.at[:, pl.ds(start_dn, 128)], head_ref, sem_out
            )
            cph.start()
            cp.wait()
            cph.wait()
            tr_ref[...] = jnp.transpose(scratch_in[...], (1, 0))
            base = k * _CHUNK

            def g_body(g, gc):
                t, r0, r1, r2 = gc
                sub = tr_ref[pl.ds(g * _SUB, _SUB), :]   # [64, 16]
                r = lambda v: v.reshape(_SUB, 1, 1)
                b = lambda v: r(v) * ones
                mxl = sub[:, 0] - x0
                myl = sub[:, 1] - y0
                ca_p, cb_p, cc_p = b(sub[:, 2]), b(sub[:, 3]), b(sub[:, 4])
                c0, c1, c2 = b(sub[:, 5]), b(sub[:, 6]), b(sub[:, 7])
                op = sub[:, 8]

                dx = px[None] - r(mxl)
                dy = py[None] - r(myl)
                power = -0.5 * (ca_p * dx * dx + cc_p * dy * dy) - cb_p * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, r(op) * jnp.exp(power))
                slot_ids = (base + g * _SUB) + jax.lax.broadcasted_iota(
                    jnp.int32, (_SUB, 1, 1), 0
                )
                g_live = (slot_ids >= head) & (slot_ids < count_eff)
                contrib = (
                    (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
                    & (slot_ids < stop[None]) & g_live
                )
                alpha_eff = jnp.where(contrib, alpha, 0.0)
                ua_eff = jnp.where(alpha < ALPHA_MAX, alpha_eff, 0.0)
                om_eff = 1.0 - alpha_eff
                inv_one = 1.0 / (1.0 - alpha)            # alpha ≤ 0.99
                gc_dot = c0 * g0[None] + c1 * g1[None] + c2 * g2[None]

                d_p_list, w_list = [], []
                for j in range(_SUB):
                    w = alpha_eff[j] * t
                    s0 = r0 - w * c0[j]
                    s1 = r1 - w * c1[j]
                    s2 = r2 - w * c2[j]
                    gs = gt_tf + g0 * s0 + g1 * s1 + g2 * s2
                    d_alpha = t * gc_dot[j] - inv_one[j] * gs
                    # where-gate: a non-finite alpha on a dead slot has
                    # contrib False but d_alpha NaN; NaN·0 would poison the
                    # moment contraction.
                    d_p_list.append(jnp.where(contrib[j], d_alpha * ua_eff[j], 0.0))
                    w_list.append(w)
                    r0, r1, r2 = s0, s1, s2
                    t = t * om_eff[j]
                d_p = jnp.stack(d_p_list)   # [64, rows, 128]
                w_all = jnp.stack(w_list)

                # Rows unrolled into 2D MXU dots (Mosaic has no batched
                # matmul — see composite._row_contract).
                mom = _row_contract(d_p, basis, amp)   # [64, 8]
                dl = _row_contract(w_all, gmat, amp)   # [64, 3]

                m1, mx_, my_ = mom[:, 0], mom[:, 1], mom[:, 2]
                mxx, mxy, myy = mom[:, 3], mom[:, 4], mom[:, 5]
                s1_ = mx_ - mxl * m1
                s2_ = my_ - myl * m1
                sxx = mxx - 2.0 * mxl * mx_ + mxl * mxl * m1
                sxy = mxy - mxl * my_ - myl * mx_ + mxl * myl * m1
                syy = myy - 2.0 * myl * my_ + myl * myl * m1
                ca, cb, cc = sub[:, 2], sub[:, 3], sub[:, 4]
                sl = pl.ds(g * _SUB, _SUB)
                dgr_ref[sl, 0] = ca * s1_ + cb * s2_
                dgr_ref[sl, 1] = cc * s2_ + cb * s1_
                dgr_ref[sl, 2] = -0.5 * sxx
                dgr_ref[sl, 3] = -sxy
                dgr_ref[sl, 4] = -0.5 * syy
                dgr_ref[sl, 5] = dl[:, 0]
                dgr_ref[sl, 6] = dl[:, 1]
                dgr_ref[sl, 7] = dl[:, 2]
                # d_opacity: alpha = op·e^power wherever unclamped, so
                # Σ d_alpha·e^power = Σ d_p / op.
                dgr_ref[sl, 8] = m1 / jnp.maximum(op, 1e-12)
                zero = jnp.zeros((_SUB,), jnp.float32)
                for col in range(9, 16):
                    dgr_ref[sl, col] = zero
                return t, r0, r1, r2

            carry2 = jax.lax.fori_loop(0, groups, g_body, (t, r0, r1, r2))
            out = jnp.transpose(dgr_ref[...], (1, 0))    # [16, _CHUNK]
            # Merge the shared boundary block on the first chunk: lanes
            # < head belong to the previous tile (segments are contiguous,
            # so its live gradients end exactly at our head offset).
            lane = jax.lax.broadcasted_iota(jnp.int32, (16, _CHUNK), 1)
            # vector-vs-scalar compare only (scalar-bool & vector-bool
            # miscompiles on Mosaic — see g_live above).
            keep_prev = lane < jnp.where(k == 0, head, 0)
            prev = jnp.concatenate(
                [head_ref[...], jnp.zeros((16, _CHUNK - 128), jnp.float32)], axis=1
            )
            scratch_out[...] = jnp.where(keep_prev, prev, out)
            cpo = pltpu.make_async_copy(
                scratch_out,
                dgrad_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)],
                sem_out,
            )
            cpo.start()
            # Await before the next chunk reuses scratch_out — also orders
            # this tile's writes before the next tile's boundary merge.
            cpo.wait()
            return carry2

        zeros = jnp.zeros((rows, 128), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros + 1.0, a0, a1, a2))

    pl.run_scoped(
        scoped,
        scratch_in=pltpu.VMEM((16, _CHUNK), jnp.float32),
        tr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        dgr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        scratch_out=pltpu.VMEM((16, _CHUNK), jnp.float32),
        head_ref=pltpu.VMEM((16, 128), jnp.float32),
        sem_in=pltpu.SemaphoreType.DMA(()),
        sem_out=pltpu.SemaphoreType.DMA(()),
    )


def _fwd_kernel_pairs_v2(
    starts_ref,            # scalar-prefetch: [NT] i32 segment starts (unaligned)
    counts_ref,            # scalar-prefetch: [NT] i32 live pairs per tile
    data_ref,              # ANY [16, pair_cap + _CHUNK] param-major pair table
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, 1, P]
    stop_ref,              # out [1, 1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
):
    """Round-4 forward: 1-op/slot chain + MXU colour accumulation.

    `_fwd_kernel_pairs` walks each 64-slot group with ~6 loop-carried vector
    ops per slot (trigger/stop bookkeeping + 3-channel accumulation). This
    kernel ports the `composite._fwd_kernel_cumprod` identities to pair
    segments: the only sequential dependency is the transmittance product
    (1 multiply/slot); weights, stop detection and the colour accumulation
    are chunk-vectorised, with the 3-channel accumulation as ONE
    [3, K] × [K, P] MXU dot per group. Early-stop bookkeeping (the n_ok
    count + frozen-transmittance min) runs under a `lax.cond` that fires
    only for groups where some pixel actually crosses T_EPS — rare (once
    per pixel per tile), so the common path stays lean.

    Semantics identical to `_fwd_kernel_pairs` (window head/tail masks,
    1/255 cutoff, 0.99 clamp, T < 1e-4 stop, stop in window-local ids).
    """
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, x0, y0)

    start_dn, head, count_eff = _window(starts_ref[i], counts_ref[i])
    n_chunks = (count_eff + _CHUNK - 1) // _CHUNK
    groups = _CHUNK // _SUB

    def scoped(scratch_in, tr_ref, sem):
        ones = jnp.ones((1, rows, 128), jnp.float32)

        def chunk_body(carry):
            k, t, stop, a0, a1, a2, _alive = carry
            cp_dma = pltpu.make_async_copy(
                data_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)], scratch_in, sem
            )
            cp_dma.start()
            cp_dma.wait()
            tr_ref[...] = jnp.transpose(scratch_in[...], (1, 0))
            base = k * _CHUNK

            def g_body(gc):
                g, t, stop, a0, a1, a2, _galive = gc
                sub = tr_ref[pl.ds(g * _SUB, _SUB), :]   # [K, 16]
                r = lambda v: v.reshape(_SUB, 1, 1)
                b = lambda v: r(v) * ones
                mx, my = r(sub[:, 0]), r(sub[:, 1])
                ca, cb, cc = b(sub[:, 2]), b(sub[:, 3]), b(sub[:, 4])
                op = r(sub[:, 8])
                dx = px[None] - mx
                dy = py[None] - my
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                sid = (base + g * _SUB) + jax.lax.broadcasted_iota(
                    jnp.int32, (_SUB, 1, 1), 0
                )
                g_live = (sid >= head) & (sid < count_eff)
                use = (power <= 0.0) & (alpha >= ALPHA_CUTOFF) & g_live
                # where-gate (not multiply): a non-finite alpha on a dead
                # slot would poison the product chain via NaN·0.
                alpha_m = jnp.where(use & (sid < stop[None]), alpha, 0.0)

                # The ONLY sequential dependency: 1 multiply per slot.
                tb = []
                tt = t
                for j in range(_SUB):
                    tb.append(tt)
                    tt = tt * (1.0 - alpha_m[j])
                t_before = jnp.stack(tb)               # [K, rows, 128]
                cum = t_before * (1.0 - alpha_m)       # unfrozen T after j
                ok = cum >= T_EPS
                w = jnp.where(ok, alpha_m * t_before, 0.0)

                # 3-channel accumulation as ONE MXU dot [3, K] × [K, P].
                cT = jnp.transpose(sub[:, 5:8], (1, 0))     # [3, K]
                acc_d = jax.lax.dot_general(
                    cT, w.reshape(_SUB, p), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # [3, P]
                a0 = a0 + acc_d[0].reshape(rows, 128)
                a1 = a1 + acc_d[1].reshape(rows, 128)
                a2 = a2 + acc_d[2].reshape(rows, 128)

                any_cross = jnp.min(tt) < T_EPS

                def crossing(_):
                    n_ok = jnp.sum(ok.astype(jnp.int32), axis=0)  # [rows, 128]
                    stop_new = jnp.where(
                        n_ok < _SUB, base + g * _SUB + n_ok, stop
                    )
                    t_new = jnp.min(jnp.where(ok, cum, t[None]), axis=0)
                    return t_new, stop_new

                def fast(_):
                    return tt, stop

                t2, stop2 = jax.lax.cond(any_cross, crossing, fast, 0)
                galive = jnp.max(stop2) >= base + (g + 1) * _SUB
                return g + 1, t2, stop2, a0, a1, a2, galive

            def g_cond(gc):
                g, _t, _stop, _a0, _a1, _a2, galive = gc
                return (g < groups) & galive

            _g, t, stop, a0, a1, a2, _ = jax.lax.while_loop(
                g_cond, g_body,
                (jnp.int32(0), t, stop, a0, a1, a2, jnp.bool_(True)),
            )
            alive = jnp.max(stop) >= (k + 1) * _CHUNK
            return k + 1, t, stop, a0, a1, a2, alive

        def chunk_cond(carry):
            k, _t, _stop, _a0, _a1, _a2, alive = carry
            return (k < n_chunks) & alive

        zeros = jnp.zeros((rows, 128), jnp.float32)
        init = (
            jnp.int32(0),
            zeros + 1.0,
            jnp.full((rows, 128), STOP_NEVER, jnp.int32),
            zeros, zeros, zeros,
            jnp.bool_(True),
        )
        _k, t, stop, a0, a1, a2, _ = jax.lax.while_loop(chunk_cond, chunk_body, init)
        acc_ref[0, 0, :] = a0.reshape(p)
        acc_ref[0, 1, :] = a1.reshape(p)
        acc_ref[0, 2, :] = a2.reshape(p)
        tfin_ref[0, 0, :] = t.reshape(p)
        stop_ref[0, 0, :] = stop.reshape(p)

    pl.run_scoped(
        scoped,
        scratch_in=pltpu.VMEM((16, _CHUNK), jnp.float32),
        tr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _bwd_kernel_pairs_v2(
    starts_ref,            # scalar-prefetch [NT] i32
    counts_ref,            # scalar-prefetch [NT] i32
    basis_ref,             # [rows, 128, 8] moment basis (tile-local)
    data_ref,              # ANY [16, pair_cap + _CHUNK]
    acc_ref,               # [1, 3, P] primal output
    tfin_ref,              # [1, 1, P]
    stop_ref,              # [1, 1, P] i32
    gacc_ref,              # [1, 3, P] cotangent of acc
    gacct_ref,             # [1, rows, 128, 3] same cotangent, matmul layout
    gt_ref,                # [1, 1, P] cotangent of t_final
    *maybe_init_and_out,   # [dginit_ref (ANY, aliased)] + dgrad_ref (ANY out)
    th: int,
    tw: int,
    ntx: int,
    amp: bool = False,
):
    """Round-4 backward: ONE fused MXU contraction per group + 2-op chains.

    `_bwd_kernel_pairs` is dominated by its 16 tiny per-row MXU dots per
    64-slot group (`composite._row_contract` — measured ≈0.2 µs each,
    ≈14 ms/frame at production occupancy) and a ~19-vector-op/slot
    sequential replay chain. This kernel removes both:

      * the colour-cotangent projection gc, the moment contraction AND the
        colour-gradient contraction ride ONE [2K, P] × [P, 16] MXU dot per
        group (left = [d_p ; w], right = [moment basis | g_acc], built once
        per tile) plus one [K, 3] × [3, P] dot for gc — the `[K, rows, 128]
        → [K, P]` reshape is exact on Mosaic (validated);
      * the sequential chain drops to 2 ops/slot via the
        `composite._bwd_kernel_cumsum` identities: t_before is a cumulative
        product of (1 − alpha_eff), and the suffix term collapses to
        gs_j = G − Σ_{s≤j} w_s·gc_s with G = gt·t_final + Σ_c g_c·acc_c a
        per-tile constant.

    Semantics (masks, clamp gating, d_opacity = M1/op, window head/tail,
    boundary RMW merge, zero_init aliasing) are identical to
    `_bwd_kernel_pairs`; parity is tested in tests/test_rasterize_sorted.py
    and tests/test_pairs_kernels_v2.py.
    """
    dgrad_ref = maybe_init_and_out[-1]
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, 0.0, 0.0)   # tile-local; means shifted

    start_dn, head, count_eff = _window(starts_ref[i], counts_ref[i])

    t_final = tfin_ref[0, 0, :].reshape(rows, 128)
    stop = stop_ref[0, 0, :].reshape(rows, 128)
    a0 = acc_ref[0, 0, :].reshape(rows, 128)
    a1 = acc_ref[0, 1, :].reshape(rows, 128)
    a2 = acc_ref[0, 2, :].reshape(rows, 128)
    g0 = gacc_ref[0, 0, :].reshape(rows, 128)
    g1 = gacc_ref[0, 1, :].reshape(rows, 128)
    g2 = gacc_ref[0, 2, :].reshape(rows, 128)
    g_t = gt_ref[0, 0, :].reshape(rows, 128)
    big_g = g_t * t_final + g0 * a0 + g1 * a1 + g2 * a2   # per-tile constant
    # Right operand of the fused contraction: [P, 16] = [moment basis (8) |
    # g_acc channels (3) | 5 pad]. Built once per tile.
    basis2 = basis_ref[...].reshape(p, 8)
    gmat2 = gacct_ref[0].reshape(p, 3)
    right = jnp.concatenate(
        [basis2, gmat2, jnp.zeros((p, 5), jnp.float32)], axis=1
    )
    # gc projection operand [3, P].
    g_rows = jnp.concatenate(
        [g0.reshape(1, p), g1.reshape(1, p), g2.reshape(1, p)], axis=0
    )
    if amp:
        right = right.astype(jnp.bfloat16)

    needed = jnp.minimum(count_eff, jnp.max(stop) + 1)
    n_chunks = (needed + _CHUNK - 1) // _CHUNK
    groups = _CHUNK // _SUB

    def scoped(scratch_in, tr_ref, dgr_ref, scratch_out, head_ref, sem_in, sem_out):
        ones = jnp.ones((1, rows, 128), jnp.float32)

        def chunk_body(k, carry):
            t, qsum = carry   # T before chunk; Σ_{s<base} w_s·gc_s
            cp = pltpu.make_async_copy(
                data_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)], scratch_in, sem_in
            )
            cp.start()
            cph = pltpu.make_async_copy(
                dgrad_ref.at[:, pl.ds(start_dn, 128)], head_ref, sem_out
            )
            cph.start()
            cp.wait()
            cph.wait()
            tr_ref[...] = jnp.transpose(scratch_in[...], (1, 0))
            base = k * _CHUNK

            def g_body(g, gc_carry):
                t, qsum = gc_carry
                sub = tr_ref[pl.ds(g * _SUB, _SUB), :]   # [K, 16]
                r = lambda v: v.reshape(_SUB, 1, 1)
                b = lambda v: r(v) * ones
                mxl = sub[:, 0] - x0
                myl = sub[:, 1] - y0
                ca_p, cb_p, cc_p = b(sub[:, 2]), b(sub[:, 3]), b(sub[:, 4])
                op = sub[:, 8]

                dx = px[None] - r(mxl)
                dy = py[None] - r(myl)
                power = -0.5 * (ca_p * dx * dx + cc_p * dy * dy) - cb_p * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, r(op) * jnp.exp(power))
                sid = (base + g * _SUB) + jax.lax.broadcasted_iota(
                    jnp.int32, (_SUB, 1, 1), 0
                )
                g_live = (sid >= head) & (sid < count_eff)
                contrib = (
                    (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
                    & (sid < stop[None]) & g_live
                )
                alpha_eff = jnp.where(contrib, alpha, 0.0)
                ua_eff = jnp.where(alpha < ALPHA_MAX, alpha_eff, 0.0)
                inv_one = 1.0 / (1.0 - alpha)            # alpha ≤ 0.99
                # gc = Σ_c color_c · g_c as ONE MXU dot [K,3] × [3,P].
                gc = jax.lax.dot_general(
                    sub[:, 5:8], g_rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(_SUB, rows, 128)

                # Sequential chain #1 (1 op/slot): transmittance.
                tb = []
                tt = t
                for j in range(_SUB):
                    tb.append(tt)
                    tt = tt * (1.0 - alpha_eff[j])
                t_before = jnp.stack(tb)                 # [K, rows, 128]
                w_all = alpha_eff * t_before
                q = w_all * gc
                # Sequential chain #2 (1 op/slot): inclusive prefix of q.
                qs = []
                qq = qsum
                for j in range(_SUB):
                    qq = qq + q[j]
                    qs.append(qq)
                q_inc = jnp.stack(qs)

                gs = big_g[None] - q_inc
                d_alpha = t_before * gc - inv_one * gs
                d_p = jnp.where(contrib, d_alpha * ua_eff, 0.0)

                # ONE fused contraction: [2K, P] × [P, 16].
                left = jnp.concatenate(
                    [d_p.reshape(_SUB, p), w_all.reshape(_SUB, p)], axis=0
                )
                if amp:
                    left = left.astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    left, right, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                        # [2K, 16]
                mom = out[:_SUB, :8]                     # moments of d_p
                dl = out[_SUB:, 8:11]                    # colour grads

                m1, mx_, my_ = mom[:, 0], mom[:, 1], mom[:, 2]
                mxx, mxy, myy = mom[:, 3], mom[:, 4], mom[:, 5]
                s1_ = mx_ - mxl * m1
                s2_ = my_ - myl * m1
                sxx = mxx - 2.0 * mxl * mx_ + mxl * mxl * m1
                sxy = mxy - mxl * my_ - myl * mx_ + mxl * myl * m1
                syy = myy - 2.0 * myl * my_ + myl * myl * m1
                ca, cb, cc = sub[:, 2], sub[:, 3], sub[:, 4]
                sl = pl.ds(g * _SUB, _SUB)
                dgr_ref[sl, 0] = ca * s1_ + cb * s2_
                dgr_ref[sl, 1] = cc * s2_ + cb * s1_
                dgr_ref[sl, 2] = -0.5 * sxx
                dgr_ref[sl, 3] = -sxy
                dgr_ref[sl, 4] = -0.5 * syy
                dgr_ref[sl, 5] = dl[:, 0]
                dgr_ref[sl, 6] = dl[:, 1]
                dgr_ref[sl, 7] = dl[:, 2]
                dgr_ref[sl, 8] = m1 / jnp.maximum(op, 1e-12)
                zero = jnp.zeros((_SUB,), jnp.float32)
                for col in range(9, 16):
                    dgr_ref[sl, col] = zero
                return tt, qq

            carry2 = jax.lax.fori_loop(0, groups, g_body, (t, qsum))
            out = jnp.transpose(dgr_ref[...], (1, 0))    # [16, _CHUNK]
            lane = jax.lax.broadcasted_iota(jnp.int32, (16, _CHUNK), 1)
            keep_prev = lane < jnp.where(k == 0, head, 0)
            prev = jnp.concatenate(
                [head_ref[...], jnp.zeros((16, _CHUNK - 128), jnp.float32)], axis=1
            )
            scratch_out[...] = jnp.where(keep_prev, prev, out)
            cpo = pltpu.make_async_copy(
                scratch_out,
                dgrad_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)],
                sem_out,
            )
            cpo.start()
            cpo.wait()
            return carry2

        zeros = jnp.zeros((rows, 128), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros + 1.0, zeros))

    pl.run_scoped(
        scoped,
        scratch_in=pltpu.VMEM((16, _CHUNK), jnp.float32),
        tr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        dgr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        scratch_out=pltpu.VMEM((16, _CHUNK), jnp.float32),
        head_ref=pltpu.VMEM((16, 128), jnp.float32),
        sem_in=pltpu.SemaphoreType.DMA(()),
        sem_out=pltpu.SemaphoreType.DMA(()),
    )


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _out_vma(*arrays) -> frozenset:
    """Union of the inputs' varying-mesh-axes sets.

    Under `shard_map(check_vma=True)` (the sharded train step) every
    `pallas_call` out_shape must declare how it varies across mesh axes;
    the kernels' outputs vary exactly as their inputs do. Outside shard_map
    every vma is empty and this is a no-op."""
    vma = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma |= frozenset(v)
    return vma


def fwd_call_pairs(dataT, starts, counts, th: int, tw: int, ntx: int):
    """Run the forward pair compositor.

    dataT: [16, pair_cap + _CHUNK] param-major pair table.
    Returns (acc [NT, 3, P], t_final [NT, P], stop [NT, P] i32; stop is in
    window-local ids — only its per-tile max is meaningful downstream)."""
    nt = starts.shape[0]
    p = th * tw
    assert p % 128 == 0, "tile pixel count must be a multiple of 128"
    # v2 (cumprod chain + MXU accumulation) is the default;
    # GSAVATARS_PAIRS_FWD=v1 re-selects the round-3 kernel for A/B.
    impl = os.environ.get("GSAVATARS_PAIRS_FWD", "v2")
    kern_fn = _fwd_kernel_pairs_v2 if impl == "v2" else _fwd_kernel_pairs
    kern = functools.partial(kern_fn, th=th, tw=tw, ntx=ntx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
        ],
    )
    vma = _out_vma(starts, counts, dataT)
    acc, tfin, stop = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 3, p), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nt, 1, p), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nt, 1, p), jnp.int32, vma=vma),
        ],
        interpret=_should_interpret(),
    )(starts.astype(jnp.int32), counts.astype(jnp.int32), dataT)
    return acc, tfin[:, 0, :], stop[:, 0, :]


def bwd_call_pairs(dataT, starts, counts, acc, t_final, stop, g_acc_t, g_t,
                   th: int, tw: int, ntx: int, amp: bool = False,
                   zero_init: bool = False):
    """Run the backward pair compositor.

    g_acc_t: [NT, P, 3] cotangent of acc (pixel-major).
    Returns pair-major gradients [16, pair_cap + _CHUNK]. With
    ``zero_init`` the output buffer is donated from a zero-filled input, so
    slots outside live segments are exact zeros (no caller-side mask);
    otherwise they carry garbage — mask with the binning's `total`."""
    nt = starts.shape[0]
    p = th * tw
    rows = p // 128
    g_acc = jnp.moveaxis(g_acc_t, 2, 1)   # [NT, 3, P]
    # v2 (fused-contraction + 2-op chains) is the default; GSAVATARS_PAIRS_BWD=v1
    # re-selects the round-3 kernel for A/B measurement.
    impl = os.environ.get("GSAVATARS_PAIRS_BWD", "v2")
    kern_fn = _bwd_kernel_pairs_v2 if impl == "v2" else _bwd_kernel_pairs
    kern = functools.partial(kern_fn, th=th, tw=tw, ntx=ntx, amp=amp)
    in_specs = [
        pl.BlockSpec((rows, 128, 8), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, rows, 128, 3), lambda i, *_: (i, 0, 0, 0)),
        pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
    ]
    args = [starts.astype(jnp.int32), counts.astype(jnp.int32),
            jnp.asarray(_moment_basis(th, tw)), dataT,
            acc, t_final[:, None, :], stop[:, None, :],
            g_acc, g_acc_t.reshape(nt, rows, 128, 3), g_t[:, None, :]]
    vma = _out_vma(*args)
    aliases = {}
    if zero_init:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        zeros = jnp.zeros(dataT.shape, jnp.float32)
        if vma:
            # The donated buffer must vary like the output it becomes.
            zeros = jax.lax.pvary(zeros, tuple(vma))
        args.append(zeros)
        # Operand index counts the scalar-prefetch args too.
        aliases = {len(args) - 1: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )
    dgrad = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(dataT.shape, jnp.float32, vma=vma),
        input_output_aliases=aliases,
        interpret=_should_interpret(),
    )(*args)
    return dgrad
