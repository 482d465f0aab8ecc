"""Pair-segment alpha-compositing Pallas kernels (forward + backward).

The production compositors for the sorted-data rasterizer
(`ops/rasterize_sorted.py`) — the TPU equivalent of the CUDA tile kernels'
``ranges``/``point_list`` architecture (reference call site
`gaussian_renderer/__init__.py:86-94`): one grid program per image tile,
walking the tile's contiguous segment of the depth-sorted pair-parameter
table in fixed ``_CHUNK``-pair DMA chunks, with per-pixel front-to-back
early termination. Nothing here scales with a per-tile capacity:

  * HBM traffic = pairs actually walked (the while loop exits as soon as
    every pixel's transmittance saturates), not tiles × capacity;
  * a tile with 13k overlapping splats is *correct* and costs only the
    few hundred front-most splats that survive the 1/255 alpha cutoff and
    the T < 1e-4 stop.

Pair parameters arrive param-major ([16, pairs + _CHUNK]: mx, my,
conic a/b/c, rgb, opacity, 7 pad rows) because Mosaic DMA slices must be
128-lane aligned — a [pairs, 16] row layout cannot be sliced. Segments are
NOT re-laid out to 128-boundaries; each kernel rounds its window down to
the previous boundary and masks the ≤127 head slots (they belong to the
previous tile). Each chunk is one DMA + one in-register [16, _CHUNK] →
[_CHUNK, 16] transpose; per-slot semantics are those of the dense ground
truth `ops/rasterize_dense.py` (1/255 cutoff, 0.99 clamp, T < 1e-4 stop).
Parity with the scan compositor / dense reference is tested in
tests/test_rasterize_sorted.py.

Gradient outputs are written pair-major by the backward kernel into a
zero-initialised aliased buffer (slots the walk never reaches stay exact
zeros). Because adjacent tiles share a 128-lane boundary block, each
tile's first chunk read-modify-writes that block (keeping the lanes owned
by the previous tile — segments are contiguous, so the boundary is
exact); the grid runs tiles in order and every chunk's out-DMA is
awaited, so the merge is race-free.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single source of truth for the compositing thresholds: the dense
# ground-truth compositor (`ops/rasterize_dense.py`).
from ..rasterize_dense import ALPHA_CUTOFF, ALPHA_MAX, T_EPS

_CHUNK = 512   # pairs per DMA chunk (one [16, 512] slice, 32 KB)
_SUB = 64      # slots per unrolled inner group
STOP_NEVER = 0x3FFFFFFF   # per-pixel stop sentinel: "never terminated"


def _pixel_coords(th: int, tw: int, x0, y0):
    """Pixel centre coordinates of this tile as [P//128, 128] f32 blocks."""
    p = th * tw
    rows = p // 128
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )
    py = (lin // tw).astype(jnp.float32) + y0
    px = (lin % tw).astype(jnp.float32) + x0
    return px, py


@functools.lru_cache(maxsize=None)
def _moment_basis(th: int, tw: int) -> np.ndarray:
    """[rows, 128, 8] basis {1, x, y, x², xy, y², 0, 0} in tile-local pixel
    coordinates, flattened exactly like `_pixel_coords`."""
    p = th * tw
    rows = p // 128
    lin = np.arange(p).reshape(rows, 128)
    x = (lin % tw).astype(np.float32)
    y = (lin // tw).astype(np.float32)
    cols = [np.ones_like(x), x, y, x * x, x * y, y * y,
            np.zeros_like(x), np.zeros_like(x)]
    return np.stack(cols, axis=-1)


def _window(start, count):
    """DMA window for an unaligned segment: 128-aligned base, head offset,
    effective slot count (head + live)."""
    start_dn = pl.multiple_of((start // 128) * 128, 128)
    head = start - start_dn
    return start_dn, head, head + count


def _fwd_kernel_pairs_v2(
    starts_ref,            # scalar-prefetch: [NT] i32 segment starts (unaligned)
    counts_ref,            # scalar-prefetch: [NT] i32 live pairs per tile
    data_ref,              # ANY [16, pairs + _CHUNK] param-major pair table
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, 1, P]
    stop_ref,              # out [1, 1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
):
    """Forward compositor: 1-op/slot chain + MXU colour accumulation.

    The only sequential dependency is the transmittance product
    (1 multiply/slot); weights, stop detection and the colour accumulation
    are chunk-vectorised, with the 3-channel accumulation as ONE
    [3, K] × [K, P] MXU dot per group. Early-stop bookkeeping (the n_ok
    count + frozen-transmittance min) runs under a `lax.cond` that fires
    only for groups where some pixel actually crosses T_EPS — rare (once
    per pixel per tile), so the common path stays lean.

    Semantics: window head/tail masks, 1/255 cutoff, 0.99 clamp,
    T < 1e-4 stop; `stop` is in window-local ids.
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


def _fwd_kernel_pairs_v3(
    starts_ref,            # scalar-prefetch: [NT] i32 segment starts (unaligned)
    counts_ref,            # scalar-prefetch: [NT] i32 live pairs per tile
    data_ref,              # ANY [16, pairs + _CHUNK] param-major pair table
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, 1, P]
    stop_ref,              # out [1, 1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
):
    """Round-5 forward: v2 + double-buffered chunk DMA + dead-tail skip.

    Two deltas against `_fwd_kernel_pairs_v2` (same math otherwise):

      * the chunk walk prefetches chunk k+1 into the other buffer slot
        before processing chunk k, hiding the DMA behind the ~4µs of
        per-chunk VPU work (an early exit waits the one outstanding
        prefetch before returning);
      * the group loop stops at the window's live extent — a SCALAR bound
        (base + g·K < count_eff) added to the while condition — instead of
        walking the full chunk. At bench occupancy (~1.5 chunks/tile) the
        final chunk averages ~50% dead slots, so this trims ~25% of the
        slot-walk volume for free.
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

    def scoped(scratch_in, tr_ref, sems):
        ones = jnp.ones((1, rows, 128), jnp.float32)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                data_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)],
                scratch_in.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(carry):
            k, t, stop, a0, a1, a2, _alive = carry
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_chunks)
            def _():
                get_dma(1 - slot, k + 1).start()

            get_dma(slot, k).wait()
            tr_ref[...] = jnp.transpose(scratch_in[slot], (1, 0))
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
                # Dead-tail skip: scalar live-extent bound (see docstring).
                return (g < groups) & (base + g * _SUB < count_eff) & galive

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
            # init miscompiles on Mosaic; the window gates ride per-slot).
            jnp.full((rows, 128), STOP_NEVER, jnp.int32),
            zeros, zeros, zeros,
            jnp.bool_(True),
        )
        k_s, t, stop, a0, a1, a2, _ = jax.lax.while_loop(
            chunk_cond, chunk_body, init
        )

        # An early exit leaves exactly one prefetch in flight: consume it.
        @pl.when(k_s < n_chunks)
        def _():
            get_dma(jax.lax.rem(k_s, 2), k_s).wait()

        acc_ref[0, 0, :] = a0.reshape(p)
        acc_ref[0, 1, :] = a1.reshape(p)
        acc_ref[0, 2, :] = a2.reshape(p)
        tfin_ref[0, 0, :] = t.reshape(p)
        stop_ref[0, 0, :] = stop.reshape(p)

    pl.run_scoped(
        scoped,
        scratch_in=pltpu.VMEM((2, 16, _CHUNK), jnp.float32),
        tr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _bwd_kernel_pairs_v2(
    starts_ref,            # scalar-prefetch [NT] i32
    counts_ref,            # scalar-prefetch [NT] i32
    basis_ref,             # [rows, 128, 8] moment basis (tile-local)
    data_ref,              # ANY [16, pairs + _CHUNK]
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

    A naive replay backward is dominated by tiny per-row MXU dots
    (measured ≈0.2 µs each, ≈14 ms/frame at production occupancy) and a
    ~19-vector-op/slot sequential chain. This kernel removes both:

      * the colour-cotangent projection gc, the moment contraction AND the
        colour-gradient contraction ride ONE [2K, P] × [P, 16] MXU dot per
        group (left = [d_p ; w], right = [moment basis | g_acc], built once
        per tile) plus one [K, 3] × [3, P] dot for gc — the `[K, rows, 128]
        → [K, P]` reshape is exact on Mosaic (validated);
      * the sequential chain drops to 2 ops/slot via prefix identities:
        t_before is a cumulative product of (1 − alpha_eff), and the
        suffix term collapses to gs_j = G − Σ_{s≤j} w_s·gc_s with
        G = gt·t_final + Σ_c g_c·acc_c a per-tile constant.

    Semantics (masks, clamp gating, d_opacity = M1/op, window head/tail,
    boundary RMW merge, zero-init aliasing) match the scan compositor's
    VJP; parity is tested in tests/test_rasterize_sorted.py.
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


def _bwd_kernel_pairs_v3(
    starts_ref,            # scalar-prefetch [NT] i32
    counts_ref,            # scalar-prefetch [NT] i32
    basis_ref,             # [rows, 128, 8] moment basis (tile-local)
    data_ref,              # ANY [16, pairs + _CHUNK]
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
    gc_vpu: bool = False,
):
    """Round-5 backward: v2 + double-buffered DMA on both ends.

    Same math as `_bwd_kernel_pairs_v2`; three scheduling deltas:

      * chunk k+1's in-DMA is prefetched into the other buffer slot before
        chunk k is processed;
      * the shared-boundary head block is fetched ONCE before the loop
        (v2 re-fetched it every chunk and blocked on it);
      * the out-DMA of chunk k overlaps chunk k+1's compute (two staging
        buffers; a slot is re-awaited before reuse, and both in-flight
        DMAs are drained before the kernel returns so the next tile's
        boundary merge still observes this tile's writes);
      * the group loop stops at the chunk's live extent — a SCALAR bound
        derived from ``needed`` (same dead-tail trim as the v3 forward,
        at group rather than chunk granularity). Groups the loop never
        reaches have their staging rows zeroed first, because the
        out-DMA ships the full chunk.
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
    basis2 = basis_ref[...].reshape(p, 8)
    gmat2 = gacct_ref[0].reshape(p, 3)
    right = jnp.concatenate(
        [basis2, gmat2, jnp.zeros((p, 5), jnp.float32)], axis=1
    )
    g_rows = jnp.concatenate(
        [g0.reshape(1, p), g1.reshape(1, p), g2.reshape(1, p)], axis=0
    )
    if amp:
        right = right.astype(jnp.bfloat16)

    needed = jnp.minimum(count_eff, jnp.max(stop) + 1)
    n_chunks = (needed + _CHUNK - 1) // _CHUNK
    groups = _CHUNK // _SUB

    def scoped(scratch_in, tr_ref, dgr_ref, scratch_out, head_ref,
               sems_in, sems_out, sem_head):
        ones = jnp.ones((1, rows, 128), jnp.float32)

        def get_in(slot, k):
            return pltpu.make_async_copy(
                data_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)],
                scratch_in.at[slot],
                sems_in.at[slot],
            )

        def get_out(slot, k):
            return pltpu.make_async_copy(
                scratch_out.at[slot],
                dgrad_ref.at[:, pl.ds(start_dn + k * _CHUNK, _CHUNK)],
                sems_out.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_in(0, 0).start()
            # Boundary head block: fetched once (consumed at k == 0 only).
            cph = pltpu.make_async_copy(
                dgrad_ref.at[:, pl.ds(start_dn, 128)], head_ref, sem_head
            )
            cph.start()
            cph.wait()

        def chunk_body(k, carry):
            t, qsum = carry   # T before chunk; Σ_{s<base} w_s·gc_s
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_chunks)
            def _():
                get_in(1 - slot, k + 1).start()

            get_in(slot, k).wait()
            tr_ref[...] = jnp.transpose(scratch_in[slot], (1, 0))
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
                if gc_vpu:
                    # v4: the k=3 contraction packs <3% of the MXU; the
                    # broadcast form is ~5 VPU ops over [K, P] and frees
                    # the MXU for the moment dot.
                    gc = (
                        r(sub[:, 5]) * g0[None]
                        + r(sub[:, 6]) * g1[None]
                        + r(sub[:, 7]) * g2[None]
                    )
                else:
                    gc = jax.lax.dot_general(
                        sub[:, 5:8], g_rows, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(_SUB, rows, 128)

                tb = []
                tt = t
                for j in range(_SUB):
                    tb.append(tt)
                    tt = tt * (1.0 - alpha_eff[j])
                t_before = jnp.stack(tb)                 # [K, rows, 128]
                w_all = alpha_eff * t_before
                q = w_all * gc
                qs = []
                qq = qsum
                for j in range(_SUB):
                    qq = qq + q[j]
                    qs.append(qq)
                q_inc = jnp.stack(qs)

                gs = big_g[None] - q_inc
                d_alpha = t_before * gc - inv_one * gs
                d_p = jnp.where(contrib, d_alpha * ua_eff, 0.0)

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

            # Dead-tail trim: only walk groups intersecting the live window
            # [head, needed). Unwalked groups' staging rows are zeroed first
            # (the out-DMA ships the full chunk, and the gradient contract
            # is exact zeros for unreached slots).
            g_hi = jnp.clip(
                (needed - base + _SUB - 1) // _SUB, 0, groups
            ).astype(jnp.int32)

            @pl.when(g_hi < groups)
            def _():
                dgr_ref[...] = jnp.zeros((_CHUNK, 16), jnp.float32)

            carry2 = jax.lax.fori_loop(0, g_hi, g_body, (t, qsum))
            out = jnp.transpose(dgr_ref[...], (1, 0))    # [16, _CHUNK]
            lane = jax.lax.broadcasted_iota(jnp.int32, (16, _CHUNK), 1)
            keep_prev = lane < jnp.where(k == 0, head, 0)
            prev = jnp.concatenate(
                [head_ref[...], jnp.zeros((16, _CHUNK - 128), jnp.float32)], axis=1
            )
            # Re-await this staging slot before overwriting it (its DMA was
            # issued two chunks ago; regions are disjoint, so two in flight
            # are race-free).
            @pl.when(k >= 2)
            def _():
                get_out(slot, k - 2).wait()

            scratch_out[slot] = jnp.where(keep_prev, prev, out)
            get_out(slot, k).start()
            return carry2

        zeros = jnp.zeros((rows, 128), jnp.float32)
        jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros + 1.0, zeros))

        # Drain in-flight out-DMAs: the next tile's head fetch must see them.
        @pl.when(n_chunks >= 2)
        def _():
            get_out(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()

        @pl.when(n_chunks >= 1)
        def _():
            get_out(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()

    pl.run_scoped(
        scoped,
        scratch_in=pltpu.VMEM((2, 16, _CHUNK), jnp.float32),
        tr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        dgr_ref=pltpu.VMEM((_CHUNK, 16), jnp.float32),
        scratch_out=pltpu.VMEM((2, 16, _CHUNK), jnp.float32),
        head_ref=pltpu.VMEM((16, 128), jnp.float32),
        sems_in=pltpu.SemaphoreType.DMA((2,)),
        sems_out=pltpu.SemaphoreType.DMA((2,)),
        sem_head=pltpu.SemaphoreType.DMA(()),
    )


def _bwd_kernel_pairs_v4(*args, **kw):
    """v3 with the colour-cotangent contraction on the VPU (gc_vpu)."""
    return _bwd_kernel_pairs_v3(*args, gc_vpu=True, **kw)


_fwd_kernel_pairs_v4 = _fwd_kernel_pairs_v3  # forward unchanged in v4


# Development A/B switch (module-private, flipped only by perf scripts;
# not an env seam — the losing implementation is deleted once measured).
_FWD_IMPL = _fwd_kernel_pairs_v3
_BWD_IMPL = _bwd_kernel_pairs_v3


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

    dataT: [16, pairs + _CHUNK] param-major pair table.
    Returns (acc [NT, 3, P], t_final [NT, P], stop [NT, P] i32; stop is in
    window-local ids — only its per-tile max is meaningful downstream)."""
    nt = starts.shape[0]
    p = th * tw
    assert p % 128 == 0, "tile pixel count must be a multiple of 128"
    kern = functools.partial(_FWD_IMPL, th=th, tw=tw, ntx=ntx)
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
                   th: int, tw: int, ntx: int, amp: bool = False):
    """Run the backward pair compositor.

    g_acc_t: [NT, P, 3] cotangent of acc (pixel-major).
    Returns pair-major gradients [16, pairs + _CHUNK]. The output buffer
    is donated from a zero-filled input, so slots outside live segments —
    including live slots past the early-stop horizon the walk never
    reaches — are exact zeros; no caller-side mask is needed."""
    nt = starts.shape[0]
    p = th * tw
    rows = p // 128
    g_acc = jnp.moveaxis(g_acc_t, 2, 1)   # [NT, 3, P]
    kern = functools.partial(_BWD_IMPL, th=th, tw=tw, ntx=ntx, amp=amp)
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
