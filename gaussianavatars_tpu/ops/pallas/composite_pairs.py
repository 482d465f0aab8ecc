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
    dgrad_ref,             # ANY out [16, pair_cap + _CHUNK]
    *,
    th: int,
    tw: int,
    ntx: int,
    amp: bool = False,
):
    """Moments backward over pair segments (see `composite._bwd_kernel_moments`
    for the math: polynomial moment contractions on the MXU replace all
    per-slot spatial reductions; tile-LOCAL coordinates keep the moment
    expansion from cancelling in f32)."""
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


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def fwd_call_pairs(dataT, starts, counts, th: int, tw: int, ntx: int):
    """Run the forward pair compositor.

    dataT: [16, pair_cap + _CHUNK] param-major pair table.
    Returns (acc [NT, 3, P], t_final [NT, P], stop [NT, P] i32; stop is in
    window-local ids — only its per-tile max is meaningful downstream)."""
    nt = starts.shape[0]
    p = th * tw
    assert p % 128 == 0, "tile pixel count must be a multiple of 128"
    kern = functools.partial(_fwd_kernel_pairs, th=th, tw=tw, ntx=ntx)
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
    acc, tfin, stop = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, p), jnp.int32),
        ],
        interpret=_should_interpret(),
    )(starts.astype(jnp.int32), counts.astype(jnp.int32), dataT)
    return acc, tfin[:, 0, :], stop[:, 0, :]


def bwd_call_pairs(dataT, starts, counts, acc, t_final, stop, g_acc_t, g_t,
                   th: int, tw: int, ntx: int, amp: bool = False):
    """Run the backward pair compositor.

    g_acc_t: [NT, P, 3] cotangent of acc (pixel-major).
    Returns pair-major gradients [16, pair_cap + _CHUNK] (slots outside live
    segments carry zeros or garbage — mask with the binning's `total`)."""
    nt = starts.shape[0]
    p = th * tw
    rows = p // 128
    g_acc = jnp.moveaxis(g_acc_t, 2, 1)   # [NT, 3, P]
    kern = functools.partial(_bwd_kernel_pairs, th=th, tw=tw, ntx=ntx, amp=amp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((rows, 128, 8), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, rows, 128, 3), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )
    dgrad = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(dataT.shape, jnp.float32),
        interpret=_should_interpret(),
    )(starts.astype(jnp.int32), counts.astype(jnp.int32),
      jnp.asarray(_moment_basis(th, tw)), dataT,
      acc, t_final[:, None, :], stop[:, None, :],
      g_acc, g_acc_t.reshape(nt, rows, 128, 3), g_t[:, None, :])
    return dgrad
