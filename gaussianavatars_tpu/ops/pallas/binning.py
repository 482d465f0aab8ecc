"""Pallas helper kernels for tile binning.

`segment_slice_table`: build the [NT, capacity] per-tile index table from the
key-sorted entry array. Each tile's entries are one *contiguous* run
`s_gidx[start : start+count]`, so the table build is NT aligned-window DMAs —
XLA's general gather costs ~17 ns per index on v5e regardless of row width
(measured), i.e. ~3 ms for a 468×512 table, while a contiguous DMA per tile
is essentially HBM-rate.

Mosaic requires DMA slices aligned to the (8×128) int32 tiling, and segment
starts are arbitrary, so each tile copies the 1024-aligned window containing
its segment and rotates it into place with a dynamic `pltpu.roll`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _slice_kernel(starts_ref, counts_ref, sgidx_ref, out_ref, *, cap: int,
                  window_rows: int):
    i = pl.program_id(0)
    start = starts_ref[i]
    count = jnp.minimum(counts_ref[i], cap)
    w_row = (start // 1024) * 8          # window start, supertile-aligned
    off = start - w_row * 128            # [0, 1024)

    def body(scratch, sem):
        cp = pltpu.make_async_copy(
            sgidx_ref.at[pl.ds(w_row, window_rows), :], scratch, sem
        )
        cp.start()
        cp.wait()
        flat = scratch[...].reshape(1, window_rows * 128)
        rolled = pltpu.roll(flat, -off, 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
        out_ref[...] = jnp.where(slot < count, rolled[:, :cap], -1)[None]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((window_rows, 128), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def segment_slice_table(
    s_gidx: jnp.ndarray,   # [M] key-sorted Gaussian indices
    starts: jnp.ndarray,   # [NT] segment starts
    counts: jnp.ndarray,   # [NT] segment lengths
    capacity: int,
) -> jnp.ndarray:
    """[NT, capacity] table: row t = s_gidx[starts[t] : starts[t]+capacity],
    slots ≥ counts[t] set to -1."""
    assert capacity % 128 == 0, "tile capacity must be a multiple of 128"
    nt = starts.shape[0]
    m = s_gidx.shape[0]
    window_rows = _round_up(8 + capacity // 128, 8)
    # Pad so any aligned window fits.
    m_pad = _round_up(m, 1024) + window_rows * 128
    padded = jnp.concatenate(
        [s_gidx, jnp.full((m_pad - m,), -1, s_gidx.dtype)]
    ).reshape(m_pad // 128, 128)
    kern = functools.partial(_slice_kernel, cap=capacity, window_rows=window_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, capacity), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, capacity), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(starts.astype(jnp.int32), counts.astype(jnp.int32), padded)
    return out[:, 0, :]
