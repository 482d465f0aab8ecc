"""LPIPS perceptual metric in pure JAX (VGG16 backbone).

Equivalent of the reference's `lpipsPyTorch/` (`lpipsPyTorch/modules/
lpips.py:8-36`, `networks.py:12-96`): five VGG16 feature stages, per-channel
unit normalization, learned 1×1 linear heads, spatial mean, sum over stages.

Weights are licensed artifacts the reference downloads at runtime
(torchvision VGG16 + the LPIPS linear heads); this module loads them from a
local file instead (zero-egress TPU pods):

  * `convert_torch_weights(vgg_pth, lpips_pth, out_npz)` — one-time import of
    the torch checkpoints (torch CPU is only needed for the conversion),
  * `load_lpips_weights(npz)` — runtime load, no torch,
  * `synthetic_lpips_params(key)` — random-but-fixed weights so tests and
    smoke runs exercise the exact compute graph without the artifacts.

The metric itself is jittable and differentiable.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per stage; stages end before pool.
VGG16_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet normalization as used by LPIPS ("shift"/"scale" buffers).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LpipsParams(NamedTuple):
    conv_w: Tuple[jnp.ndarray, ...]   # each [kh, kw, cin, cout]
    conv_b: Tuple[jnp.ndarray, ...]
    lin_w: Tuple[jnp.ndarray, ...]    # per stage [c] (1x1 conv weights, non-neg)


def _stage_channels() -> List[int]:
    return [c for c, _ in VGG16_STAGES]


def vgg16_features(params: LpipsParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [H, W, 3] in [-1, 1] (LPIPS input convention). Returns the 5
    stage activations (post-ReLU, pre-pool)."""
    h = (x - _SHIFT) / _SCALE
    h = h[None]  # NHWC
    feats = []
    i = 0
    for stage, (cout, n_convs) in enumerate(VGG16_STAGES):
        for _ in range(n_convs):
            h = jax.lax.conv_general_dilated(
                h, params.conv_w[i], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + params.conv_b[i]
            h = jax.nn.relu(h)
            i += 1
        feats.append(h[0])
        if stage < len(VGG16_STAGES) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return f / (jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips(params: LpipsParams, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between two [H, W, 3] images in [0, 1]."""
    x = img1 * 2.0 - 1.0
    y = img2 * 2.0 - 1.0
    fx = vgg16_features(params, x)
    fy = vgg16_features(params, y)
    total = jnp.zeros(())
    for f1, f2, w in zip(fx, fy, params.lin_w):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def synthetic_lpips_params(key: Optional[jax.Array] = None) -> LpipsParams:
    """Deterministic random weights with VGG16 shapes (tests/smoke only)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    conv_w, conv_b = [], []
    cin = 3
    for cout, n_convs in VGG16_STAGES:
        for _ in range(n_convs):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (3, 3, cin, cout)) * (1.0 / np.sqrt(9 * cin))
            conv_w.append(w)
            conv_b.append(jnp.zeros((cout,)))
            cin = cout
    lin = []
    for c in _stage_channels():
        key, k = jax.random.split(key)
        lin.append(jax.random.uniform(k, (c,)) * 0.1)
    return LpipsParams(tuple(conv_w), tuple(conv_b), tuple(lin))


def convert_torch_weights(vgg_pth: str, lpips_pth: str, out_npz: str) -> str:
    """One-time conversion: torchvision `vgg16` state dict + LPIPS linear
    checkpoint → a single npz in this module's layout."""
    import torch

    vgg = torch.load(vgg_pth, map_location="cpu", weights_only=True)
    lin = torch.load(lpips_pth, map_location="cpu", weights_only=True)
    out = {}
    conv_keys = sorted(
        (k for k in vgg if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]),
    )
    for i, k in enumerate(conv_keys):
        w = vgg[k].numpy()  # [cout, cin, kh, kw] → HWIO
        out[f"conv_w_{i}"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv_b_{i}"] = vgg[k.replace("weight", "bias")].numpy()
    for i in range(len(VGG16_STAGES)):
        key = f"lin{i}.model.1.weight"
        out[f"lin_w_{i}"] = np.maximum(lin[key].numpy().reshape(-1), 0.0)
    np.savez(out_npz, **out)
    return out_npz


def load_lpips_weights(npz_path: str) -> LpipsParams:
    data = np.load(npz_path)
    n_convs = sum(n for _, n in VGG16_STAGES)
    conv_w = tuple(jnp.asarray(data[f"conv_w_{i}"]) for i in range(n_convs))
    conv_b = tuple(jnp.asarray(data[f"conv_b_{i}"]) for i in range(n_convs))
    lin_w = tuple(jnp.asarray(data[f"lin_w_{i}"]) for i in range(len(VGG16_STAGES)))
    return LpipsParams(conv_w, conv_b, lin_w)


def maybe_load_default() -> Optional[LpipsParams]:
    """Load from $GSAVATARS_LPIPS_WEIGHTS if set and present."""
    import os

    path = os.environ.get("GSAVATARS_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_lpips_weights(path)
    return None
