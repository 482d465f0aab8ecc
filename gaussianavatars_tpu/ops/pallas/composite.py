"""Per-tile alpha-compositing Pallas kernels (forward + backward).

The TPU replacement for the CUDA tile kernels in
``diff-gaussian-rasterization`` (reference call site
`gaussian_renderer/__init__.py:86-94`). One grid program per image tile;
its ≤capacity front-to-back Gaussian list sits in VMEM. Two data-dependent
savings the dense `lax.scan` fallback (`ops/rasterize_tiled.py`) cannot
express:

  * the chunk loop is bounded by the *actual* per-tile count
    (scalar-prefetched) instead of the static capacity, and
  * it exits early once every pixel's transmittance saturates (forward) or
    every pixel is past its stop index (backward).

Kernel shape (measured on v5e): per-slot *scalar* VMEM loads are ~4× slower
than the math itself, so slots are processed in chunks of ``_CHUNK``: one
dynamic-sublane vector load per parameter per chunk, slot broadcasts as
[K, 1, 1] against the [rows, 128] pixel block, and the sequential
transmittance recurrence runs over the K leading rows in registers.

Semantics match the scan compositor exactly (1/255 alpha cutoff, 0.99 alpha
clamp, per-pixel T<1e-4 early stop), which in turn matches
`ops/rasterize_dense.py`, the tested ground truth. The backward runs
**front-to-back** using suffix_s = acc_total − prefix_{≤s} (acc_total is the
saved primal output) — Mosaic cannot store per-slot scalars to VMEM, so
per-chunk grads become aligned sublane-vector stores.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single source of truth for the compositing thresholds: the dense
# ground-truth compositor. Duplicating the literals here would let a tune
# there silently desynchronize the Pallas kernels from the compositors
# they are tested for exact parity against.
from ..rasterize_dense import ALPHA_CUTOFF, ALPHA_MAX, T_EPS

_CHUNK = 64  # slots per chunk; must divide the tile capacity.
# 64 beats 32 by ~2% on both render and fwd+bwd at 802x550/92k (v5e):
# fewer loop iterations and larger sublane vector loads per parameter table.


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


def _load_chunk(mean_ref, conic_ref, color_ref, opac_ref, base, k, ones=None):
    """One vector load per parameter table for k consecutive slots.

    Values are returned as [K, 1, 1] broadcasts. Entries named in the caller
    must be *materialised* to [K, rows, 128] before per-slot (2D) indexing —
    Mosaic can broadcast [K,1,1] against a 3D tensor but cannot broadcast a
    2D [1,1] slice in both sublanes and lanes. Pass `ones` ([1, rows, 128])
    to get fully-broadcast colour/conic planes.
    """
    m = mean_ref[0, pl.ds(base, k), :]     # [K, 2]
    co = conic_ref[0, pl.ds(base, k), :]   # [K, 3]
    cl = color_ref[0, pl.ds(base, k), :]   # [K, 3]
    op = opac_ref[0, pl.ds(base, k), 0]    # [K]
    r = lambda v: v.reshape(k, 1, 1)
    b = (lambda v: r(v) * ones) if ones is not None else r
    return (
        r(m[:, 0]), r(m[:, 1]),
        b(co[:, 0]), b(co[:, 1]), b(co[:, 2]),
        b(cl[:, 0]), b(cl[:, 1]), b(cl[:, 2]),
        r(op),
    )


def _chunk_alpha(px, py, mx, my, ca, cb, cc, op):
    """Alpha/use of K slots against the tile's pixels: [K, rows, 128]."""
    dx = px[None] - mx
    dy = py[None] - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, op * expp)
    use = (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
    return dx, dy, expp, alpha, use


def _fwd_kernel(
    counts_ref,            # scalar-prefetch: [NT] i32
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C, 1]
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, 1, P]
    stop_ref,              # out [1, 1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
    capacity: int,
):
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, x0, y0)

    count = jnp.minimum(counts_ref[i], capacity)
    K = _CHUNK
    n_chunks = (count + K - 1) // K

    ones = jnp.ones((1, rows, 128), jnp.float32)

    def body(carry):
        k, t, stop, a0, a1, a2, _alive = carry
        base = k * K
        mx, my, ca, cb, cc, c0, c1, c2, op = _load_chunk(
            mean_ref, conic_ref, color_ref, opac_ref, base, K, ones=ones
        )
        _dx, _dy, _expp, alpha, use = _chunk_alpha(px, py, mx, my, ca, cb, cc, op)
        w0 = jnp.zeros_like(a0)
        w1 = jnp.zeros_like(a0)
        w2 = jnp.zeros_like(a0)
        for j in range(K):
            s = base + j
            running = s < stop
            test_t = t * (1.0 - alpha[j])
            trigger = use[j] & running & (test_t < T_EPS)
            stop = jnp.where(trigger, s, stop)
            contrib = use[j] & running & jnp.logical_not(trigger)
            w = jnp.where(contrib, alpha[j] * t, 0.0)
            w0 = w0 + w * c0[j]
            w1 = w1 + w * c1[j]
            w2 = w2 + w * c2[j]
            t = jnp.where(contrib, test_t, t)
        a0 = a0 + w0
        a1 = a1 + w1
        a2 = a2 + w2
        # A pixel is finished once its stop index is set (< capacity). `t`
        # freezes just ABOVE T_EPS at the trigger, so testing t itself would
        # never fire; any pixel whose stop lies beyond this chunk keeps the
        # loop going.
        alive = jnp.max(stop) >= (k + 1) * K
        return k + 1, t, stop, a0, a1, a2, alive

    def cond(carry):
        k, _t, _stop, _a0, _a1, _a2, alive = carry
        return (k < n_chunks) & alive

    zeros = jnp.zeros((rows, 128), jnp.float32)
    init = (
        jnp.int32(0),
        zeros + 1.0,
        jnp.full((rows, 128), capacity, jnp.int32),
        zeros, zeros, zeros,
        jnp.bool_(True),
    )
    _k, t, stop, a0, a1, a2, _ = jax.lax.while_loop(cond, body, init)
    acc_ref[0, 0, :] = a0.reshape(p)
    acc_ref[0, 1, :] = a1.reshape(p)
    acc_ref[0, 2, :] = a2.reshape(p)
    tfin_ref[0, 0, :] = t.reshape(p)
    stop_ref[0, 0, :] = stop.reshape(p)


def _fwd_kernel_cumprod(
    counts_ref,            # scalar-prefetch: [NT] i32
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C, 1]
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, 1, P]
    stop_ref,              # out [1, 1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
    capacity: int,
):
    """Forward compositing with the sequential work cut to ONE multiply/slot.

    `_fwd_kernel` carries ~12 vector ops per slot in its loop-carried
    recurrence (trigger/stop bookkeeping + 3-channel accumulation). This
    variant exploits that, within a chunk, the frozen-transmittance
    semantics are recoverable from an UNfrozen cumulative product: with
    alpha_m = alpha masked by `use` and the carried stop index,

      * cp_j = t_in · Π_{s≤j} (1 − alpha_m_s) is non-increasing, and the
        per-pixel trigger of `_fwd_kernel` fires exactly at the first j
        with cp_j < T_EPS (slots that do not pass `use`/`running` leave cp
        unchanged, so the crossing slot is always a live one);
      * slot j contributes iff cp_j ≥ T_EPS, with weight alpha_m_j·cp_{j−1}
        (contributions after the crossing have cp < T_EPS, matching the
        `running` gate of the sequential form because nothing survives past
        the first trigger);
      * the carried-out transmittance is the last cp still ≥ T_EPS — i.e.
        min over the ok slots (cp is non-increasing), t_in when the first
        live slot triggers — which equals the frozen value;
      * the stop index is base + #{j : cp_j ≥ T_EPS} when a crossing
        happens in this chunk, else unchanged (a pixel stopped in an
        earlier chunk has all alpha_m = 0 here ⇒ cp = t_in ≥ T_EPS — the
        frozen t always sits above T_EPS — so no crossing can re-fire).

    Everything else — weights, stop detection, the colour accumulation —
    becomes chunk-vectorised [K, rows, 128] ops with axis-0 reductions.
    Exact parity with `_fwd_kernel` is tested in
    tests/test_pallas_composite.py (forward, grads, early-stop scenes).
    """
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, x0, y0)

    count = jnp.minimum(counts_ref[i], capacity)
    K = _CHUNK
    n_chunks = (count + K - 1) // K

    ones = jnp.ones((1, rows, 128), jnp.float32)

    def body(carry):
        k, t, stop, a0, a1, a2, _alive = carry
        base = k * K
        mx, my, ca, cb, cc, c0, c1, c2, op = _load_chunk(
            mean_ref, conic_ref, color_ref, opac_ref, base, K, ones=ones
        )
        _dx, _dy, _expp, alpha, use = _chunk_alpha(px, py, mx, my, ca, cb, cc, op)
        slot_ids = base + jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
        # where-gate (not multiply): a non-finite alpha on a dead slot has
        # use=False but would poison cp via NaN·0.
        alpha_m = jnp.where(use & (slot_ids < stop[None]), alpha, 0.0)

        # The ONLY loop-carried dependency: t_before_j = t·Π_{s<j}(1−alpha_m).
        tb = []
        tt = t
        for j in range(K):
            tb.append(tt)
            tt = tt * (1.0 - alpha_m[j])
        t_before = jnp.stack(tb)              # [K, rows, 128]
        cp = t_before * (1.0 - alpha_m)       # unfrozen transmittance AFTER j
        ok = cp >= T_EPS
        w = jnp.where(ok, alpha_m * t_before, 0.0)
        a0 = a0 + jnp.sum(w * c0, axis=0)
        a1 = a1 + jnp.sum(w * c1, axis=0)
        a2 = a2 + jnp.sum(w * c2, axis=0)
        n_ok = jnp.sum(ok.astype(jnp.int32), axis=0)     # [rows, 128]
        stop = jnp.where(n_ok < K, base + n_ok, stop)
        t = jnp.min(jnp.where(ok, cp, t[None]), axis=0)
        alive = jnp.max(stop) >= (k + 1) * K
        return k + 1, t, stop, a0, a1, a2, alive

    def cond(carry):
        k, _t, _stop, _a0, _a1, _a2, alive = carry
        return (k < n_chunks) & alive

    zeros = jnp.zeros((rows, 128), jnp.float32)
    init = (
        jnp.int32(0),
        zeros + 1.0,
        jnp.full((rows, 128), capacity, jnp.int32),
        zeros, zeros, zeros,
        jnp.bool_(True),
    )
    _k, t, stop, a0, a1, a2, _ = jax.lax.while_loop(cond, body, init)
    acc_ref[0, 0, :] = a0.reshape(p)
    acc_ref[0, 1, :] = a1.reshape(p)
    acc_ref[0, 2, :] = a2.reshape(p)
    tfin_ref[0, 0, :] = t.reshape(p)
    stop_ref[0, 0, :] = stop.reshape(p)


def _bwd_kernel_moments(
    counts_ref,            # scalar-prefetch [NT] i32
    basis_ref,             # [R, 128, 8] moment basis (1, x, y, x², xy, y², 0, 0)
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C, 1]
    acc_ref,               # [1, 3, P] primal output (premultiplied colour)
    tfin_ref,              # [1, 1, P]
    stop_ref,              # [1, 1, P] i32
    gacc_ref,              # [1, 3, P] cotangent of acc
    gacct_ref,             # [1, R, 128, 3] same cotangent, matmul layout
    gt_ref,                # [1, 1, P] cotangent of t_final
    dmean_ref,             # out [1, C, 2]
    dconic_ref,            # out [1, C, 3]
    dcolor_ref,            # out [1, C, 3]
    dopac_ref,             # out [1, C, 1]
    *,
    th: int,
    tw: int,
    ntx: int,
    capacity: int,
    amp: bool = False,
):
    """Backward replay, restructured around two MXU contractions per chunk.

    The round-1 kernel did 9 scalar reductions over the [rows, 128] pixel
    block per slot (576 per chunk) plus a 17-op `d_alpha` chain. Two
    observations remove almost all of it:

      * every mean/conic/opacity gradient is a polynomial (degree ≤ 2) in
        the pixel offset, so all five spatial reductions collapse into the
        *moments* of d_p against the fixed basis {1, x, y, x², xy, y²} in
        tile-LOCAL coordinates (local keeps |x| ≤ tile_w so the moment
        expansion Σd_p·dx² = Mxx − 2μMx + μ²M1 does not cancel
        catastrophically in f32), and d_opacity = M1/opacity exactly
        (alpha = opacity·exp(power) wherever the gradient is nonzero);
      * the colour gradients are dot products of the per-slot weights
        against the cotangent image.

    So the sequential part of the loop shrinks to the transmittance /
    colour-prefix recurrence plus a refactored
    `d_alpha = t·gc − inv1·gs` (gc, gs = colour-/suffix-contractions with
    the cotangents), the per-slot weights are stacked once per chunk, and
    ONE batched dot against the basis plus ONE against the cotangent image
    replace all 576 reductions.
    """
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    # Tile-LOCAL pixel coordinates; means are shifted to match below.
    px, py = _pixel_coords(th, tw, 0.0, 0.0)

    count = jnp.minimum(counts_ref[i], capacity)

    dmean_ref[...] = jnp.zeros_like(dmean_ref)
    dconic_ref[...] = jnp.zeros_like(dconic_ref)
    dcolor_ref[...] = jnp.zeros_like(dcolor_ref)
    dopac_ref[...] = jnp.zeros_like(dopac_ref)

    t_final = tfin_ref[0, 0, :].reshape(rows, 128)
    stop = stop_ref[0, 0, :].reshape(rows, 128)
    a0 = acc_ref[0, 0, :].reshape(rows, 128)
    a1 = acc_ref[0, 1, :].reshape(rows, 128)
    a2 = acc_ref[0, 2, :].reshape(rows, 128)
    g0 = gacc_ref[0, 0, :].reshape(rows, 128)
    g1 = gacc_ref[0, 1, :].reshape(rows, 128)
    g2 = gacc_ref[0, 2, :].reshape(rows, 128)
    g_t = gt_ref[0, 0, :].reshape(rows, 128)
    gt_tf = g_t * t_final          # slot-independent part of gs
    basis = basis_ref[...]         # [rows, 128, 8]
    gmat = gacct_ref[0]            # [rows, 128, 3]

    K = _CHUNK
    needed = jnp.minimum(count, jnp.max(stop) + 1)
    n_chunks = (needed + K - 1) // K

    ones = jnp.ones((1, rows, 128), jnp.float32)

    def chunk_body(k, carry):
        t, r0, r1, r2 = carry  # T before slot; residual a_c − prefix_{<s}
        base = k * K
        m = mean_ref[0, pl.ds(base, K), :]     # [K, 2]
        co = conic_ref[0, pl.ds(base, K), :]   # [K, 3]
        cl = color_ref[0, pl.ds(base, K), :]   # [K, 3]
        op = opac_ref[0, pl.ds(base, K), 0]    # [K]
        r = lambda v: v.reshape(K, 1, 1)
        b = lambda v: r(v) * ones
        mxl = m[:, 0] - x0
        myl = m[:, 1] - y0
        ca_p, cb_p, cc_p = b(co[:, 0]), b(co[:, 1]), b(co[:, 2])
        c0, c1, c2 = b(cl[:, 0]), b(cl[:, 1]), b(cl[:, 2])

        dx = px[None] - r(mxl)
        dy = py[None] - r(myl)
        power = -0.5 * (ca_p * dx * dx + cc_p * dy * dy) - cb_p * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, r(op) * jnp.exp(power))
        slot_ids = base + jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
        contrib = (power <= 0.0) & (alpha >= ALPHA_CUTOFF) & (slot_ids < stop[None])
        alpha_eff = jnp.where(contrib, alpha, 0.0)          # w/alpha with masks
        ua_eff = jnp.where(alpha < ALPHA_MAX, alpha_eff, 0.0)
        om_eff = 1.0 - alpha_eff
        inv_one = 1.0 / (1.0 - alpha)                       # alpha ≤ 0.99
        gc = c0 * g0[None] + c1 * g1[None] + c2 * g2[None]  # [K, rows, 128]

        d_p_list, w_list = [], []
        for j in range(K):
            w = alpha_eff[j] * t
            s0 = r0 - w * c0[j]
            s1 = r1 - w * c1[j]
            s2 = r2 - w * c2[j]
            gs = gt_tf + g0 * s0 + g1 * s1 + g2 * s2
            d_alpha = t * gc[j] - inv_one[j] * gs
            # where-gate rather than multiply-by-zero: a non-finite alpha
            # (degenerate conic on a dead slot) makes contrib False but
            # d_alpha NaN, and NaN*0 = NaN would poison the whole chunk's
            # moment contraction (the sibling kernels gate the same way).
            d_p_list.append(jnp.where(contrib[j], d_alpha * ua_eff[j], 0.0))
            w_list.append(w)
            r0, r1, r2 = s0, s1, s2
            t = t * om_eff[j]
        d_p = jnp.stack(d_p_list)   # [K, rows, 128]
        w_all = jnp.stack(w_list)

        # [K,rows,128] × [rows,128,F] — rows unrolled, lanes contracted → MXU.
        # Under the AMP policy the contraction inputs drop to bf16 (one MXU
        # pass, f32 accumulation): ~0.4% relative gradient error, quantified
        # in tests/test_amp.py.
        mom = _row_contract(d_p, basis, amp)   # [K, 8]: M1, Mx, My, Mxx, Mxy, Myy
        dl = _row_contract(w_all, gmat, amp)   # [K, 3]

        m1, mx, my = mom[:, 0], mom[:, 1], mom[:, 2]
        mxx, mxy, myy = mom[:, 3], mom[:, 4], mom[:, 5]
        s1_ = mx - mxl * m1
        s2_ = my - myl * m1
        sxx = mxx - 2.0 * mxl * mx + mxl * mxl * m1
        sxy = mxy - mxl * my - myl * mx + mxl * myl * m1
        syy = myy - 2.0 * myl * my + myl * myl * m1
        ca, cb, cc = co[:, 0], co[:, 1], co[:, 2]
        sl = pl.ds(base, K)
        dmean_ref[0, sl, 0] = ca * s1_ + cb * s2_
        dmean_ref[0, sl, 1] = cc * s2_ + cb * s1_
        dconic_ref[0, sl, 0] = -0.5 * sxx
        dconic_ref[0, sl, 1] = -sxy
        dconic_ref[0, sl, 2] = -0.5 * syy
        dcolor_ref[0, sl, 0] = dl[:, 0]
        dcolor_ref[0, sl, 1] = dl[:, 1]
        dcolor_ref[0, sl, 2] = dl[:, 2]
        # d_opacity: alpha = op·e^power wherever unclamped, so
        # Σ d_alpha·e^power = Σ d_p / op — no extra reduction.
        dopac_ref[0, sl, 0] = m1 / jnp.maximum(op, 1e-12)
        return t, r0, r1, r2

    zeros = jnp.zeros((rows, 128), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros + 1.0, a0, a1, a2))


def _bwd_kernel_cumsum(
    counts_ref,            # scalar-prefetch [NT] i32
    basis_ref,             # [R, 128, 8] moment basis (1, x, y, x², xy, y², 0, 0)
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C, 1]
    acc_ref,               # [1, 3, P] primal output (premultiplied colour)
    tfin_ref,              # [1, 1, P]
    stop_ref,              # [1, 1, P] i32
    gacc_ref,              # [1, 3, P] cotangent of acc
    gacct_ref,             # [1, R, 128, 3] same cotangent, matmul layout
    gt_ref,                # [1, 1, P] cotangent of t_final
    dmean_ref,             # out [1, C, 2]
    dconic_ref,            # out [1, C, 3]
    dcolor_ref,            # out [1, C, 3]
    dopac_ref,             # out [1, C, 1]
    *,
    th: int,
    tw: int,
    ntx: int,
    capacity: int,
    amp: bool = False,
):
    """The moments backward with the sequential chain cut to 2 ops/slot.

    `_bwd_kernel_moments` still walks the chunk slot-by-slot to carry the
    transmittance and the three per-channel colour-prefix residuals (~15
    loop-carried vector ops per slot). Two identities remove the residuals:

      * t_before is a cumulative product of (1 − alpha_eff), exactly as in
        `_fwd_kernel_cumprod` — but here no threshold bookkeeping is needed
        at all, because the saved per-pixel `stop` already encodes where
        compositing ended (slots ≥ stop are masked out of `contrib`);
      * the suffix term only ever appears g-weighted:
        gs_j = gt·t_final + Σ_c g_c·(a_c − prefix_{≤j,c})
             = G − Σ_{s≤j} w_s·gc_s,   G = gt·t_final + Σ_c g_c·a_c,
        since Σ_c g_c·w_s·c_{s,c} = w_s·gc_s and gc is already computed for
        d_alpha — so THREE per-channel cumulative sums collapse into ONE
        cumulative sum of q = w·gc, and G is a per-tile constant.

    Everything else (the moment/colour MXU contractions, the polynomial
    reconstruction of mean/conic grads, d_opacity = M1/op) is identical to
    `_bwd_kernel_moments`. Exact-parity tests vs the scan compositor grads:
    tests/test_pallas_composite.py.
    """
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    # Tile-LOCAL pixel coordinates; means are shifted to match below.
    px, py = _pixel_coords(th, tw, 0.0, 0.0)

    count = jnp.minimum(counts_ref[i], capacity)

    dmean_ref[...] = jnp.zeros_like(dmean_ref)
    dconic_ref[...] = jnp.zeros_like(dconic_ref)
    dcolor_ref[...] = jnp.zeros_like(dcolor_ref)
    dopac_ref[...] = jnp.zeros_like(dopac_ref)

    t_final = tfin_ref[0, 0, :].reshape(rows, 128)
    stop = stop_ref[0, 0, :].reshape(rows, 128)
    a0 = acc_ref[0, 0, :].reshape(rows, 128)
    a1 = acc_ref[0, 1, :].reshape(rows, 128)
    a2 = acc_ref[0, 2, :].reshape(rows, 128)
    g0 = gacc_ref[0, 0, :].reshape(rows, 128)
    g1 = gacc_ref[0, 1, :].reshape(rows, 128)
    g2 = gacc_ref[0, 2, :].reshape(rows, 128)
    g_t = gt_ref[0, 0, :].reshape(rows, 128)
    big_g = g_t * t_final + g0 * a0 + g1 * a1 + g2 * a2   # per-tile constant G
    basis = basis_ref[...]         # [rows, 128, 8]
    gmat = gacct_ref[0]            # [rows, 128, 3]

    K = _CHUNK
    needed = jnp.minimum(count, jnp.max(stop) + 1)
    n_chunks = (needed + K - 1) // K

    ones = jnp.ones((1, rows, 128), jnp.float32)

    def chunk_body(k, carry):
        t, qsum = carry  # T before the chunk; Σ_{s<base} w_s·gc_s
        base = k * K
        m = mean_ref[0, pl.ds(base, K), :]     # [K, 2]
        co = conic_ref[0, pl.ds(base, K), :]   # [K, 3]
        cl = color_ref[0, pl.ds(base, K), :]   # [K, 3]
        op = opac_ref[0, pl.ds(base, K), 0]    # [K]
        r = lambda v: v.reshape(K, 1, 1)
        b = lambda v: r(v) * ones
        mxl = m[:, 0] - x0
        myl = m[:, 1] - y0
        ca_p, cb_p, cc_p = b(co[:, 0]), b(co[:, 1]), b(co[:, 2])
        c0, c1, c2 = b(cl[:, 0]), b(cl[:, 1]), b(cl[:, 2])

        dx = px[None] - r(mxl)
        dy = py[None] - r(myl)
        power = -0.5 * (ca_p * dx * dx + cc_p * dy * dy) - cb_p * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, r(op) * jnp.exp(power))
        slot_ids = base + jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
        contrib = (power <= 0.0) & (alpha >= ALPHA_CUTOFF) & (slot_ids < stop[None])
        alpha_eff = jnp.where(contrib, alpha, 0.0)          # w/alpha with masks
        ua_eff = jnp.where(alpha < ALPHA_MAX, alpha_eff, 0.0)
        inv_one = 1.0 / (1.0 - alpha)                       # alpha ≤ 0.99
        gc = c0 * g0[None] + c1 * g1[None] + c2 * g2[None]  # [K, rows, 128]

        # Sequential chain #1: transmittance before each slot.
        tb = []
        tt = t
        for j in range(K):
            tb.append(tt)
            tt = tt * (1.0 - alpha_eff[j])
        t_before = jnp.stack(tb)            # [K, rows, 128]
        w_all = alpha_eff * t_before
        q = w_all * gc
        # Sequential chain #2: inclusive prefix of q across the chunk.
        qs = []
        qq = qsum
        for j in range(K):
            qq = qq + q[j]
            qs.append(qq)
        q_inc = jnp.stack(qs)               # [K, rows, 128]

        gs = big_g[None] - q_inc
        d_alpha = t_before * gc - inv_one * gs
        # where-gate rather than multiply-by-zero: a non-finite alpha
        # (degenerate conic on a dead slot) makes contrib False but
        # d_alpha NaN, and NaN*0 = NaN would poison the whole chunk's
        # moment contraction (the sibling kernels gate the same way).
        d_p = jnp.where(contrib, d_alpha * ua_eff, 0.0)

        # [K,rows,128] × [rows,128,F] — rows unrolled, lanes contracted → MXU.
        mom = _row_contract(d_p, basis, amp)   # [K, 8]: M1, Mx, My, Mxx, Mxy, Myy
        dl = _row_contract(w_all, gmat, amp)   # [K, 3]

        m1, mx, my = mom[:, 0], mom[:, 1], mom[:, 2]
        mxx, mxy, myy = mom[:, 3], mom[:, 4], mom[:, 5]
        s1_ = mx - mxl * m1
        s2_ = my - myl * m1
        sxx = mxx - 2.0 * mxl * mx + mxl * mxl * m1
        sxy = mxy - mxl * my - myl * mx + mxl * myl * m1
        syy = myy - 2.0 * myl * my + myl * myl * m1
        ca, cb, cc = co[:, 0], co[:, 1], co[:, 2]
        sl = pl.ds(base, K)
        dmean_ref[0, sl, 0] = ca * s1_ + cb * s2_
        dmean_ref[0, sl, 1] = cc * s2_ + cb * s1_
        dconic_ref[0, sl, 0] = -0.5 * sxx
        dconic_ref[0, sl, 1] = -sxy
        dconic_ref[0, sl, 2] = -0.5 * syy
        dcolor_ref[0, sl, 0] = dl[:, 0]
        dcolor_ref[0, sl, 1] = dl[:, 1]
        dcolor_ref[0, sl, 2] = dl[:, 2]
        # d_opacity: alpha = op·e^power wherever unclamped, so
        # Σ d_alpha·e^power = Σ d_p / op — no extra reduction.
        dopac_ref[0, sl, 0] = m1 / jnp.maximum(op, 1e-12)
        return tt, qq

    zeros = jnp.zeros((rows, 128), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros + 1.0, zeros))


def _bwd_kernel(
    counts_ref,            # scalar-prefetch [NT] i32
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C, 1]
    acc_ref,               # [1, 3, P] primal output (premultiplied colour)
    tfin_ref,              # [1, 1, P]
    stop_ref,              # [1, 1, P] i32
    gacc_ref,              # [1, 3, P] cotangent of acc
    gt_ref,                # [1, 1, P] cotangent of t_final
    dmean_ref,             # out [1, C, 2]
    dconic_ref,            # out [1, C, 3]
    dcolor_ref,            # out [1, C, 3]
    dopac_ref,             # out [1, C, 1]
    *,
    th: int,
    tw: int,
    ntx: int,
    capacity: int,
):
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, x0, y0)

    count = jnp.minimum(counts_ref[i], capacity)

    # Zero-fill outputs (the loop only writes slots < count).
    dmean_ref[...] = jnp.zeros_like(dmean_ref)
    dconic_ref[...] = jnp.zeros_like(dconic_ref)
    dcolor_ref[...] = jnp.zeros_like(dcolor_ref)
    dopac_ref[...] = jnp.zeros_like(dopac_ref)

    t_final = tfin_ref[0, 0, :].reshape(rows, 128)
    stop = stop_ref[0, 0, :].reshape(rows, 128)
    a0 = acc_ref[0, 0, :].reshape(rows, 128)
    a1 = acc_ref[0, 1, :].reshape(rows, 128)
    a2 = acc_ref[0, 2, :].reshape(rows, 128)
    g0 = gacc_ref[0, 0, :].reshape(rows, 128)
    g1 = gacc_ref[0, 1, :].reshape(rows, 128)
    g2 = gacc_ref[0, 2, :].reshape(rows, 128)
    g_t = gt_ref[0, 0, :].reshape(rows, 128)

    K = _CHUNK
    # Slots at s ≥ every pixel's stop index have zero gradients: bound the
    # replay by max(stop) as well as count.
    needed = jnp.minimum(count, jnp.max(stop) + 1)
    n_chunks = (needed + K - 1) // K

    ones = jnp.ones((1, rows, 128), jnp.float32)

    def chunk_body(k, carry):
        t, p0, p1, p2 = carry   # T before slot, prefix Σ_{j<s} w_j c_j
        base = k * K
        mx, my, ca, cb, cc, c0, c1, c2, op = _load_chunk(
            mean_ref, conic_ref, color_ref, opac_ref, base, K, ones=ones
        )
        dx, dy, expp, alpha, use = _chunk_alpha(px, py, mx, my, ca, cb, cc, op)
        one_minus = 1.0 - alpha
        inv_one = 1.0 / one_minus
        unclamped = alpha < ALPHA_MAX

        dm0, dm1, dc0, dc1, dc2, dl0, dl1, dl2, dop = ([] for _ in range(9))
        for j in range(K):
            s = base + j
            contrib = use[j] & (s < stop)
            w = jnp.where(contrib, alpha[j] * t, 0.0)
            wc0 = w * c0[j]
            wc1 = w * c1[j]
            wc2 = w * c2[j]
            # suffix over slots >s from the saved total: acc − prefix_{≤s}.
            s0 = a0 - p0 - wc0
            s1 = a1 - p1 - wc1
            s2 = a2 - p2 - wc2
            d_alpha = (
                g0 * (c0[j] * t - s0 * inv_one[j])
                + g1 * (c1[j] * t - s1 * inv_one[j])
                + g2 * (c2[j] * t - s2 * inv_one[j])
                + g_t * (-t_final * inv_one[j])
            )
            d_alpha = jnp.where(contrib, d_alpha, 0.0)
            d_o_pix = jnp.where(unclamped[j], d_alpha * expp[j], 0.0)
            d_p = jnp.where(unclamped[j], d_alpha * alpha[j], 0.0)
            dm0.append(jnp.sum(d_p * (ca[j] * dx[j] + cb[j] * dy[j])))
            dm1.append(jnp.sum(d_p * (cc[j] * dy[j] + cb[j] * dx[j])))
            dc0.append(jnp.sum(d_p * (-0.5 * dx[j] * dx[j])))
            dc1.append(jnp.sum(d_p * (-dx[j] * dy[j])))
            dc2.append(jnp.sum(d_p * (-0.5 * dy[j] * dy[j])))
            dl0.append(jnp.sum(w * g0))
            dl1.append(jnp.sum(w * g1))
            dl2.append(jnp.sum(w * g2))
            dop.append(jnp.sum(d_o_pix))
            p0 = p0 + wc0
            p1 = p1 + wc1
            p2 = p2 + wc2
            t = jnp.where(contrib, t * one_minus[j], t)
        sl = pl.ds(base, K)
        dmean_ref[0, sl, 0] = jnp.stack(dm0)
        dmean_ref[0, sl, 1] = jnp.stack(dm1)
        dconic_ref[0, sl, 0] = jnp.stack(dc0)
        dconic_ref[0, sl, 1] = jnp.stack(dc1)
        dconic_ref[0, sl, 2] = jnp.stack(dc2)
        dcolor_ref[0, sl, 0] = jnp.stack(dl0)
        dcolor_ref[0, sl, 1] = jnp.stack(dl1)
        dcolor_ref[0, sl, 2] = jnp.stack(dl2)
        dopac_ref[0, sl, 0] = jnp.stack(dop)
        return t, p0, p1, p2

    zeros = jnp.zeros((rows, 128), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, chunk_body, (zeros + 1.0, zeros, zeros, zeros))


class _Res(NamedTuple):
    g_mean2d: jnp.ndarray
    g_conic: jnp.ndarray
    g_color: jnp.ndarray
    g_opac: jnp.ndarray
    counts: jnp.ndarray
    acc: jnp.ndarray       # [NT, 3, P] primal output
    t_final: jnp.ndarray
    stop: jnp.ndarray


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(g_mean2d, g_conic, g_color, g_opac, counts, th, tw, ntx):
    nt, c = g_opac.shape
    p = th * tw
    assert p % 128 == 0, "tile pixel count must be a multiple of 128"
    assert c % _CHUNK == 0, f"tile capacity must be a multiple of {_CHUNK}"
    # GSAVATARS_FWD_IMPL=cumprod selects the cumulative-product forward
    # (one sequential multiply per slot instead of the ~12-op recurrence);
    # "loop" stays the default until the variant's Mosaic compile + win are
    # confirmed on real TPU (scripts/micro_bwd_compile.py --fwd, bench.py).
    use_cumprod = os.environ.get("GSAVATARS_FWD_IMPL", "loop") == "cumprod"
    kern_fn = _fwd_kernel_cumprod if use_cumprod else _fwd_kernel
    kern = functools.partial(kern_fn, th=th, tw=tw, ntx=ntx, capacity=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, c, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 1), lambda i, *_: (i, 0, 0)),
        ],
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
    )(counts, g_mean2d, g_conic, g_color, g_opac[:, :, None])
    return acc, tfin[:, 0, :], stop[:, 0, :]


def _row_contract(mat, basis, amp: bool):
    """Σ_r mat[:, r, :] @ basis[r] → [K, F] as UNROLLED 2D MXU dots.

    Equivalent to `dot_general` with rows batched and lanes contracted,
    then summed over rows — but Mosaic has no batched matmul (it rejects
    the 3D form with "Not Implemented: batch dims must be equal"), so the
    row axis is unrolled into `rows` small [K,128]×[128,F] dots. Under the
    AMP policy the dot inputs drop to bf16 with f32 accumulation.
    """
    if amp:
        mat = mat.astype(jnp.bfloat16)
        basis = basis.astype(jnp.bfloat16)
    out = None
    for r in range(mat.shape[1]):
        t = jax.lax.dot_general(
            mat[:, r, :], basis[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = t if out is None else out + t
    return out


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


def _bwd_call(res: _Res, g_acc_t, g_t, th, tw, ntx, amp=False):
    """g_acc_t: [NT, P, 3] cotangent of acc (pixel-major layout)."""
    nt, c = res.g_opac.shape
    p = th * tw
    rows = p // 128
    g_acc = jnp.moveaxis(g_acc_t, 2, 1)  # [NT, 3, P] plane layout
    impl = os.environ.get("GSAVATARS_BWD_IMPL", "moments")
    kern_fn = {
        "moments": _bwd_kernel_moments,
        "cumsum": _bwd_kernel_cumsum,   # moments + 2-op/slot sequential chain
    }.get(impl, _bwd_kernel)            # anything else → replay
    use_moments = kern_fn is not _bwd_kernel  # moment-basis input plumbing
    kw = {"amp": amp} if use_moments else {}
    kern = functools.partial(kern_fn, th=th, tw=tw, ntx=ntx, capacity=c, **kw)
    moment_specs = ([pl.BlockSpec((rows, 128, 8), lambda i, *_: (0, 0, 0))]
                    if use_moments else [])
    gacct_specs = ([pl.BlockSpec((1, rows, 128, 3), lambda i, *_: (i, 0, 0, 0))]
                   if use_moments else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=moment_specs + [
            pl.BlockSpec((1, c, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
        ] + gacct_specs + [
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 1), lambda i, *_: (i, 0, 0)),
        ],
    )
    moment_args = ([jnp.asarray(_moment_basis(th, tw))] if use_moments else [])
    gacct_args = ([g_acc_t.reshape(nt, rows, 128, 3)] if use_moments else [])
    d_mean, d_conic, d_color, d_opac = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, c, 2), jnp.float32),
            jax.ShapeDtypeStruct((nt, c, 3), jnp.float32),
            jax.ShapeDtypeStruct((nt, c, 3), jnp.float32),
            jax.ShapeDtypeStruct((nt, c, 1), jnp.float32),
        ],
        interpret=_should_interpret(),
    )(res.counts, *moment_args,
      res.g_mean2d, res.g_conic, res.g_color, res.g_opac[:, :, None],
      res.acc, res.t_final[:, None, :], res.stop[:, None, :], g_acc,
      *gacct_args, g_t[:, None, :])
    return d_mean, d_conic, d_color, d_opac[:, :, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_pallas(geom, g_mean2d, g_conic, g_color, g_opac, counts):
    """Pallas tile compositor. `geom` = static (th, tw, ntx[, amp]); `counts`
    is the per-tile Gaussian count from `bin_gaussians` (integer, non-diff).
    `amp` selects bf16 inputs for the backward's MXU contractions.

    Returns (acc [NT, P, 3] premultiplied colour, t_final [NT, P]).
    """
    th, tw, ntx = geom[:3]
    acc, tfin, _stop = _fwd_call(g_mean2d, g_conic, g_color, g_opac, counts, th, tw, ntx)
    return jnp.moveaxis(acc, 1, 2), tfin


def _pallas_fwd(geom, g_mean2d, g_conic, g_color, g_opac, counts):
    th, tw, ntx = geom[:3]
    acc, tfin, stop = _fwd_call(g_mean2d, g_conic, g_color, g_opac, counts, th, tw, ntx)
    res = _Res(g_mean2d, g_conic, g_color, g_opac, counts, acc, tfin, stop)
    return (jnp.moveaxis(acc, 1, 2), tfin), res


def _pallas_bwd(geom, res: _Res, cot):
    th, tw, ntx = geom[:3]
    amp = geom[3] if len(geom) > 3 else False
    g_acc, g_t = cot  # g_acc: [NT, P, 3]
    d_mean, d_conic, d_color, d_opac = _bwd_call(res, g_acc, g_t, th, tw, ntx, amp=amp)
    d_counts = np.zeros(res.counts.shape, dtype=jax.dtypes.float0)
    return d_mean, d_conic, d_color, d_opac, d_counts


composite_tiles_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def make_pallas_compositor(counts, th: int, tw: int, ntx: int, amp: bool = False):
    """Adapter matching the `composite_tiles` call signature used by
    `rasterize_binned` (tile_origin is ignored — pixel origins are derived
    from the program id and the static grid width)."""
    counts = jax.lax.stop_gradient(counts).astype(jnp.int32)

    def call(tile_origin, g_mean2d, g_conic, g_color, g_opac, cfg=None):
        return composite_tiles_pallas(
            (th, tw, ntx, amp), g_mean2d, g_conic, g_color, g_opac, counts
        )

    return call
