"""Per-tile alpha-compositing Pallas kernels (forward + backward).

The TPU replacement for the CUDA tile kernels in
``diff-gaussian-rasterization`` (reference call site
`gaussian_renderer/__init__.py:86-94`). One grid program per image tile;
its ≤capacity front-to-back Gaussian list sits in VMEM; the slot loop is a
`lax.while_loop` bounded by the *actual* per-tile count (scalar-prefetched)
with transmittance early-exit — the two data-dependent savings XLA cannot
express on dense arrays (the `lax.scan` fallback in `ops/rasterize_tiled.py`
always walks full capacity).

Semantics match the scan compositor exactly (1/255 alpha cutoff, 0.99 alpha
clamp, per-pixel T<1e-4 early stop with stop-index replay in the backward),
which in turn matches `ops/rasterize_dense.py`, the tested ground truth.

Layout notes (guide: /opt/skills/guides/pallas_guide.md):
  * tile pixels are processed as a [P//128, 128] f32 vreg block (P = th·tw
    must be a multiple of 128), so every per-slot update is a handful of
    full-width VPU instructions;
  * per-slot parameters are scalar reads from the tile's VMEM slot table;
  * the backward replays back-to-front from the saved final transmittance
    and per-pixel stop index — nothing O(capacity × pixels) is stored.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_CUTOFF = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


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


def _fwd_kernel(
    counts_ref,            # scalar-prefetch: [NT] i32
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C]
    acc_ref,               # out [1, 3, P]
    tfin_ref,              # out [1, P]
    stop_ref,              # out [1, P] i32
    *,
    th: int,
    tw: int,
    ntx: int,
    capacity: int,
    check_every: int = 8,
):
    i = pl.program_id(0)
    p = th * tw
    rows = p // 128
    x0 = ((i % ntx) * tw).astype(jnp.float32)
    y0 = ((i // ntx) * th).astype(jnp.float32)
    px, py = _pixel_coords(th, tw, x0, y0)

    count = jnp.minimum(counts_ref[i], capacity)

    def body(carry):
        s, t, stop, a0, a1, a2, _alive = carry
        mx = mean_ref[0, s, 0]
        my = mean_ref[0, s, 1]
        ca = conic_ref[0, s, 0]
        cb = conic_ref[0, s, 1]
        cc = conic_ref[0, s, 2]
        op = opac_ref[0, s]
        dx = px - mx
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        use = (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
        running = s < stop
        test_t = t * (1.0 - alpha)
        trigger = use & running & (test_t < T_EPS)
        stop = jnp.where(trigger, s, stop)
        contrib = use & running & jnp.logical_not(trigger)
        w = jnp.where(contrib, alpha * t, 0.0)
        a0 = a0 + w * color_ref[0, s, 0]
        a1 = a1 + w * color_ref[0, s, 1]
        a2 = a2 + w * color_ref[0, s, 2]
        t = jnp.where(contrib, test_t, t)
        # Re-check liveness only every `check_every` slots (reduction cost).
        alive = jax.lax.cond(
            (s + 1) % check_every == 0,
            lambda: jnp.max(t) >= T_EPS,
            lambda: jnp.bool_(True),
        )
        return s + 1, t, stop, a0, a1, a2, alive

    def cond(carry):
        s, _t, _stop, _a0, _a1, _a2, alive = carry
        return (s < count) & alive

    zeros = jnp.zeros((rows, 128), jnp.float32)
    init = (
        jnp.int32(0),
        zeros + 1.0,
        jnp.full((rows, 128), capacity, jnp.int32),
        zeros, zeros, zeros,
        jnp.bool_(True),
    )
    _s, t, stop, a0, a1, a2, _ = jax.lax.while_loop(cond, body, init)
    acc_ref[0, 0, :] = a0.reshape(p)
    acc_ref[0, 1, :] = a1.reshape(p)
    acc_ref[0, 2, :] = a2.reshape(p)
    tfin_ref[0, :] = t.reshape(p)
    stop_ref[0, :] = stop.reshape(p)


def _bwd_kernel(
    counts_ref,            # scalar-prefetch [NT] i32
    mean_ref,              # [1, C, 2]
    conic_ref,             # [1, C, 3]
    color_ref,             # [1, C, 3]
    opac_ref,              # [1, C]
    tfin_ref,              # [1, P]
    stop_ref,              # [1, P] i32
    gacc_ref,              # [1, 3, P] cotangent of acc
    gt_ref,                # [1, P]    cotangent of t_final
    dmean_ref,             # out [1, C, 2]
    dconic_ref,            # out [1, C, 3]
    dcolor_ref,            # out [1, C, 3]
    dopac_ref,             # out [1, C]
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

    t_final = tfin_ref[0, :].reshape(rows, 128)
    stop = stop_ref[0, :].reshape(rows, 128)
    g0 = gacc_ref[0, 0, :].reshape(rows, 128)
    g1 = gacc_ref[0, 1, :].reshape(rows, 128)
    g2 = gacc_ref[0, 2, :].reshape(rows, 128)
    g_t = gt_ref[0, :].reshape(rows, 128)

    def body(k, carry):
        # Replay slots back-to-front: s = count-1-k.
        t_after, s0, s1, s2 = carry   # T_{s+1}; suffix Σ_{j>s} c_j α_j T_j
        s = count - 1 - k
        mx = mean_ref[0, s, 0]
        my = mean_ref[0, s, 1]
        ca = conic_ref[0, s, 0]
        cb = conic_ref[0, s, 1]
        cc = conic_ref[0, s, 2]
        op = opac_ref[0, s]
        c0 = color_ref[0, s, 0]
        c1 = color_ref[0, s, 1]
        c2 = color_ref[0, s, 2]
        dx = px - mx
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        use = (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
        contrib = use & (s < stop)
        one_minus = 1.0 - alpha
        t_i = jnp.where(contrib, t_after / one_minus, t_after)
        w = jnp.where(contrib, alpha * t_i, 0.0)

        inv_one = 1.0 / one_minus
        d_alpha = (
            g0 * (c0 * t_i - s0 * inv_one)
            + g1 * (c1 * t_i - s1 * inv_one)
            + g2 * (c2 * t_i - s2 * inv_one)
            + g_t * (-t_final * inv_one)
        )
        d_alpha = jnp.where(contrib, d_alpha, 0.0)
        unclamped = alpha < ALPHA_MAX
        d_o_pix = jnp.where(unclamped, d_alpha * jnp.exp(power), 0.0)
        d_p = jnp.where(unclamped, d_alpha * alpha, 0.0)

        dcolor_ref[0, s, 0] = jnp.sum(w * g0)
        dcolor_ref[0, s, 1] = jnp.sum(w * g1)
        dcolor_ref[0, s, 2] = jnp.sum(w * g2)
        dopac_ref[0, s] = jnp.sum(d_o_pix)
        dconic_ref[0, s, 0] = jnp.sum(d_p * (-0.5 * dx * dx))
        dconic_ref[0, s, 1] = jnp.sum(d_p * (-dx * dy))
        dconic_ref[0, s, 2] = jnp.sum(d_p * (-0.5 * dy * dy))
        dmean_ref[0, s, 0] = jnp.sum(d_p * (ca * dx + cb * dy))
        dmean_ref[0, s, 1] = jnp.sum(d_p * (cc * dy + cb * dx))

        s0 = s0 + w * c0
        s1 = s1 + w * c1
        s2 = s2 + w * c2
        return t_i, s0, s1, s2

    zeros = jnp.zeros((rows, 128), jnp.float32)
    jax.lax.fori_loop(0, count, body, (t_final, zeros, zeros, zeros))


class _Res(NamedTuple):
    g_mean2d: jnp.ndarray
    g_conic: jnp.ndarray
    g_color: jnp.ndarray
    g_opac: jnp.ndarray
    counts: jnp.ndarray
    t_final: jnp.ndarray
    stop: jnp.ndarray


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(g_mean2d, g_conic, g_color, g_opac, counts, th, tw, ntx):
    nt, c = g_opac.shape
    p = th * tw
    assert p % 128 == 0, "tile pixel count must be a multiple of 128"
    kern = functools.partial(_fwd_kernel, th=th, tw=tw, ntx=ntx, capacity=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, c, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, p), lambda i, *_: (i, 0)),
        ],
    )
    acc, tfin, stop = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((nt, p), jnp.float32),
            jax.ShapeDtypeStruct((nt, p), jnp.int32),
        ],
        interpret=_should_interpret(),
    )(counts, g_mean2d, g_conic, g_color, g_opac)
    return acc, tfin, stop


def _bwd_call(res: _Res, g_acc, g_t, th, tw, ntx):
    nt, c = res.g_opac.shape
    p = th * tw
    kern = functools.partial(_bwd_kernel, th=th, tw=tw, ntx=ntx, capacity=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, c, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, p), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, p), lambda i, *_: (i, 0)),
            pl.BlockSpec((1, 3, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, p), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, 2), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, *_: (i, 0)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, c, 2), jnp.float32),
            jax.ShapeDtypeStruct((nt, c, 3), jnp.float32),
            jax.ShapeDtypeStruct((nt, c, 3), jnp.float32),
            jax.ShapeDtypeStruct((nt, c), jnp.float32),
        ],
        interpret=_should_interpret(),
    )(res.counts, res.g_mean2d, res.g_conic, res.g_color, res.g_opac,
      res.t_final, res.stop, g_acc, g_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_pallas(geom, g_mean2d, g_conic, g_color, g_opac, counts):
    """Pallas tile compositor. `geom` = static (th, tw, ntx); `counts` is the
    per-tile Gaussian count from `bin_gaussians` (integer, non-diff).

    Returns (acc [NT, P, 3] premultiplied colour, t_final [NT, P]).
    """
    th, tw, ntx = geom
    acc, tfin, _stop = _fwd_call(g_mean2d, g_conic, g_color, g_opac, counts, th, tw, ntx)
    return jnp.moveaxis(acc, 1, 2), tfin


def _pallas_fwd(geom, g_mean2d, g_conic, g_color, g_opac, counts):
    th, tw, ntx = geom
    acc, tfin, stop = _fwd_call(g_mean2d, g_conic, g_color, g_opac, counts, th, tw, ntx)
    res = _Res(g_mean2d, g_conic, g_color, g_opac, counts, tfin, stop)
    return (jnp.moveaxis(acc, 1, 2), tfin), res


def _pallas_bwd(geom, res: _Res, cot):
    th, tw, ntx = geom
    g_acc, g_t = cot
    g_acc = jnp.moveaxis(g_acc, 2, 1)  # [NT, 3, P]
    d_mean, d_conic, d_color, d_opac = _bwd_call(res, g_acc, g_t, th, tw, ntx)
    d_counts = np.zeros(res.counts.shape, dtype=jax.dtypes.float0)
    return d_mean, d_conic, d_color, d_opac, d_counts


composite_tiles_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def make_pallas_compositor(counts, th: int, tw: int, ntx: int):
    """Adapter matching the `composite_tiles` call signature used by
    `rasterize_binned` (tile_origin is ignored — pixel origins are derived
    from the program id and the static grid width)."""
    counts = jax.lax.stop_gradient(counts).astype(jnp.int32)

    def call(tile_origin, g_mean2d, g_conic, g_color, g_opac, cfg=None):
        return composite_tiles_pallas(
            (th, tw, ntx), g_mean2d, g_conic, g_color, g_opac, counts
        )

    return call
