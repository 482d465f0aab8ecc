"""3-nearest-neighbour mean squared distance (simple-knn equivalent).

Replaces the CUDA ``simple_knn._C.distCUDA2`` the reference uses once at init
(`scene/gaussian_model.py:23,196-198`) to seed Gaussian scales. The CUDA
version approximates via Morton-code buckets; on TPU an *exact* blockwise
top-3 is simple and fast enough for an init-time op (N ≤ a few 10⁵: the
pairwise pass is pure VPU work): stream row-blocks with `lax.map`, keep a
running top-3 per point, never materialise the N×N matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block",))
def mean_sq_dist_3nn(points: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Mean of squared distances to the 3 nearest neighbours, per point.

    Args:
      points: [N, 3].
    Returns: [N] float32.
    """
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=jnp.inf)
    np_ = pts.shape[0]
    sq = jnp.sum(jnp.nan_to_num(pts, posinf=0.0) ** 2, axis=1)

    def row_block(start):
        rows = jax.lax.dynamic_slice(pts, (start, 0), (block, 3))
        rows_sq = jnp.sum(jnp.nan_to_num(rows, posinf=0.0) ** 2, axis=1)
        # [block, Np] squared distances (‖a‖² - 2a·b + ‖b‖²) — one matmul.
        d2 = (
            rows_sq[:, None]
            - 2.0 * (jnp.nan_to_num(rows, posinf=0.0) @ jnp.nan_to_num(pts, posinf=0.0).T)
            + sq[None, :]
        )
        # Exclude self and padding.
        col = jnp.arange(np_)[None, :]
        row = start + jnp.arange(block)[:, None]
        d2 = jnp.where((col == row) | (col >= n), jnp.inf, d2)
        # Smallest three distances: top-3 of negated values.
        top3, _ = jax.lax.top_k(-d2, 3)
        return jnp.mean(-top3, axis=1)

    starts = jnp.arange(0, np_, block)
    out = jax.lax.map(row_block, starts).reshape(-1)
    return out[:n]
