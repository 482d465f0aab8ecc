"""The five training innovations as pure-JAX plugins.

Functional re-designs of `innovations/` (reference `innovations/__init__.py`):
each is stateless or carries its state explicitly through the train step
(XLA-friendly — no module mutation):

  1. Region-adaptive loss  → a weight-map function (FLAME-projected boxes or
     the heuristic face prior), consumed by `weighted_l1_loss`.
  2. Smart densification   → percentile thresholds computed from accumulated
     gradient stats, fed into `densify_and_prune` as per-Gaussian thresholds.
  3. Progressive resolution → a pure schedule (host-side; the trainer swaps
     pre-traced resolution buckets).
  4. Color calibration     → a tiny per-pixel MLP as a param pytree with its
     own Adam, applied to the rendered image.
  5. Contrastive regulariser → a fixed-size cache of downsampled renders
     carried in the train state; loss = mean(1 − cosine) against the cache.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1. Region-adaptive loss weighting (`innovations/region_adaptive_loss.py`)
# ---------------------------------------------------------------------------


def heuristic_weight_map(
    height: int,
    width: int,
    weight_eyes: float = 2.0,
    weight_mouth: float = 2.0,
    weight_nose: float = 1.5,
    weight_face: float = 1.2,
) -> jnp.ndarray:
    """Gaussian-blob face prior (`_heuristic_map`, reference :90-105). [H, W]."""
    y = jnp.linspace(-1.0, 1.0, height)[:, None]
    x = jnp.linspace(-1.0, 1.0, width)[None, :]
    face = jnp.exp(-((x * 1.2) ** 2 + y**2))
    w = 1 + (weight_face - 1) * face
    eye = jnp.exp(-((x / 0.3) ** 2 + ((y + 0.2) / 0.15) ** 2))
    mouth = jnp.exp(-((x / 0.3) ** 2 + ((y - 0.4) / 0.2) ** 2))
    nose = jnp.exp(-((x / 0.2) ** 2 + (y / 0.3) ** 2))
    w = jnp.maximum(w, 1 + (weight_eyes - 1) * eye)
    w = jnp.maximum(w, 1 + (weight_mouth - 1) * mouth)
    w = jnp.maximum(w, 1 + (weight_nose - 1) * nose)
    return w


def flame_region_weight_map(
    verts: jnp.ndarray,            # [V, 3] posed FLAME vertices
    region_vids: dict,             # name → [K] vertex ids (static)
    camera,
    height: int,
    width: int,
    weight_eyes: float = 2.0,
    weight_mouth: float = 2.0,
    weight_nose: float = 1.5,
) -> jnp.ndarray:
    """Project region vertices and splat box weights around them.

    Box splatting (reference `_rasterize_region` :50-64) re-expressed without
    a Python loop: for each pixel, weight = max over regions of
    (any vertex's box covers the pixel) · region weight. Uses a coarse
    max-pool trick: scatter vertex hits into the image then dilate with a
    (2r+1) max filter — identical result, TPU-shaped.
    """
    full = camera.full_proj.astype(jnp.float32)
    hom = verts @ full[:3, :3].T + full[:3, 3]
    w = verts @ full[3, :3] + full[3, 3]
    ndc = hom[:, :2] / (w[:, None] + 1e-7)
    # Same NDC→pixel orientation as the rasterizer (ops/projection.py
    # ndc_to_pixel — y DOWN with +ndc_y at the bottom, no flip): the weight
    # boxes must land on the same pixels the regions render to.
    px = jnp.clip((ndc[:, 0] * 0.5 + 0.5) * (width - 1), 0, width - 1).astype(jnp.int32)
    py = jnp.clip((ndc[:, 1] * 0.5 + 0.5) * (height - 1), 0, height - 1).astype(jnp.int32)

    radius = max(height, width) // 60
    wmap = jnp.ones((height, width), jnp.float32)
    regions = [
        (("eyes_left", "eyes_right"), weight_eyes),
        (("mouth",), weight_mouth),
        (("nose",), weight_nose),
    ]
    for names, wgt in regions:
        parts = [np.asarray(region_vids[n], np.int32).reshape(-1)
                 for n in names if n in region_vids]
        vids = np.concatenate(parts) if parts else np.zeros((0,), np.int32)
        if vids.size == 0:  # region absent (or clipped away) — no boxes
            continue
        vids = jnp.asarray(vids)
        hit = jnp.zeros((height, width), jnp.float32)
        hit = hit.at[py[vids], px[vids]].set(1.0)
        # Dilate by `radius` with a separable max-pool.
        k = 2 * radius + 1
        hit = jax.lax.reduce_window(hit, -jnp.inf, jax.lax.max, (k, 1), (1, 1), "SAME")
        hit = jax.lax.reduce_window(hit, -jnp.inf, jax.lax.max, (1, k), (1, 1), "SAME")
        wmap = jnp.maximum(wmap, jnp.where(hit > 0, wgt, 1.0))
    return wmap


# ---------------------------------------------------------------------------
# 2. Smart densification (`innovations/smart_densification.py`)
# ---------------------------------------------------------------------------


def smart_thresholds(
    grad_accum: jnp.ndarray,
    denom: jnp.ndarray,
    max_grad: float,
    percentile_clone: float = 75.0,
    percentile_split: float = 90.0,
):
    """Percentile thresholds over nonzero grad norms, floored at
    0.3/0.7 · max_grad (reference `smart_densification.py:18-52`).

    Returns scalar (clone_thr, split_thr) — masked quantile over live stats.
    """
    grads = jnp.where(denom > 0, grad_accum / jnp.maximum(denom, 1.0), 0.0)
    nz = grads > 0
    # Masked quantile: sort with zeros pushed to the front, index by count.
    n = grads.shape[0]
    sorted_g = jnp.sort(jnp.where(nz, grads, -jnp.inf))
    cnt = jnp.sum(nz)

    def q(p):
        idx = n - cnt + jnp.clip((cnt - 1) * p / 100.0, 0, n - 1).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n - 1)
        return jnp.where(cnt > 0, sorted_g[idx], max_grad)

    clone_thr = jnp.maximum(q(percentile_clone), 0.3 * max_grad)
    split_thr = jnp.maximum(q(percentile_split), 0.7 * max_grad)
    return clone_thr, split_thr


# ---------------------------------------------------------------------------
# 3. Progressive resolution (`innovations/progressive_training.py`)
# ---------------------------------------------------------------------------


def resolution_scale_at(
    iteration: int,
    schedule: Sequence[float] = (0.5, 0.75, 1.0),
    milestones: Sequence[int] = (100_000, 300_000),
) -> float:
    """Piecewise-constant resolution factor (host-side, static per bucket)."""
    idx = sum(1 for m in milestones if iteration >= m)
    return schedule[min(idx, len(schedule) - 1)]


# ---------------------------------------------------------------------------
# 4. Color calibration network (`innovations/color_calibration.py`)
# ---------------------------------------------------------------------------


class ColorNetParams(NamedTuple):
    weights: tuple            # tuple of [in, out] matrices
    biases: tuple             # tuple of [out]


def color_net_init(key, hidden: int = 16, layers: int = 3) -> ColorNetParams:
    """3 → hidden → … → 3 per-pixel MLP, final sigmoid."""
    dims = [3] + [hidden] * (layers - 1) + [3]
    ws, bs = [], []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, k = jax.random.split(key)
        ws.append(jax.random.normal(k, (a, b)) * jnp.sqrt(2.0 / a))
        bs.append(jnp.zeros((b,)))
    return ColorNetParams(weights=tuple(ws), biases=tuple(bs))


def color_net_apply(p: ColorNetParams, image: jnp.ndarray) -> jnp.ndarray:
    """image [H, W, 3] → calibrated [H, W, 3] (residual-free, sigmoid out)."""
    x = image
    n = len(p.weights)
    for i, (w, b) in enumerate(zip(p.weights, p.biases)):
        x = x @ w + b
        x = jax.nn.relu(x) if i < n - 1 else jax.nn.sigmoid(x)
    return x


def color_net_reg(p: ColorNetParams) -> jnp.ndarray:
    """L2 weight regulariser (`color_calibration.py:37-42`)."""
    return sum(jnp.sum(w**2) for w in p.weights)


# ---------------------------------------------------------------------------
# 5. Contrastive regularisation (`innovations/contrastive_regularization.py`)
# ---------------------------------------------------------------------------


class ContrastiveCache(NamedTuple):
    images: jnp.ndarray   # [cache, h, w, 3] downsampled renders
    count: jnp.ndarray    # [] int32 number of valid entries
    head: jnp.ndarray     # [] int32 ring-buffer write position


def contrastive_init(cache_size: int, height: int, width: int, downsample: int = 8):
    # `downsample` is the pooled OUTPUT size (the reference pools every
    # render to a fixed downsample×downsample thumbnail via
    # `F.adaptive_avg_pool2d(image, 8)`, contrastive_regularization.py:18,26)
    # — so the cache shape is resolution-independent and survives
    # progressive-resolution milestones. height/width are accepted for
    # call-site symmetry but do not affect the cache shape.
    del height, width
    return ContrastiveCache(
        images=jnp.zeros((cache_size, downsample, downsample, 3)),
        count=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def _downsample(image: jnp.ndarray, out: int) -> jnp.ndarray:
    """Exact `adaptive_avg_pool2d(image, out)` via an integral image.

    Bin i covers rows [floor(i*H/out), ceil((i+1)*H/out)) — torch's
    adaptive-pooling boundaries — so non-divisible sizes match too."""
    h, w, _ = image.shape
    ii = jnp.pad(image, ((1, 0), (1, 0), (0, 0))).cumsum(0).cumsum(1)
    i = np.arange(out)
    ys, ye = (i * h) // out, -((-(i + 1) * h) // out)
    xs, xe = (i * w) // out, -((-(i + 1) * w) // out)
    s = ii[ye][:, xe] - ii[ys][:, xe] - ii[ye][:, xs] + ii[ys][:, xs]
    area = ((ye - ys)[:, None] * (xe - xs)[None, :]).astype(image.dtype)
    return s / area[..., None]


def contrastive_loss(cache: ContrastiveCache, image: jnp.ndarray, downsample: int) -> jnp.ndarray:
    """mean(1 − cosine) against valid cache entries (reference :20-31)."""
    small = _downsample(image, downsample).reshape(-1)
    flat = cache.images.reshape(cache.images.shape[0], -1)
    dot = flat @ small
    cos = dot / (
        jnp.linalg.norm(flat, axis=1) * jnp.linalg.norm(small) + 1e-8
    )
    valid = jnp.arange(cache.images.shape[0]) < cache.count
    n = jnp.maximum(cache.count, 1)
    return jnp.sum(jnp.where(valid, 1.0 - cos, 0.0)) / n


def contrastive_update(cache: ContrastiveCache, image: jnp.ndarray, downsample: int):
    small = _downsample(jax.lax.stop_gradient(image), downsample)
    images = jax.lax.dynamic_update_index_in_dim(cache.images, small, cache.head, 0)
    size = cache.images.shape[0]
    return ContrastiveCache(
        images=images,
        count=jnp.minimum(cache.count + 1, size),
        head=(cache.head + 1) % size,
    )
