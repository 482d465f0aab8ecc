"""LPIPS perceptual metric in pure JAX (VGG16 and AlexNet backbones).

Equivalent of the reference's `lpipsPyTorch/` (`lpipsPyTorch/modules/
lpips.py:8-36`, `networks.py:12-96`): backbone feature stages, per-channel
unit normalization, learned 1×1 linear heads, spatial mean, sum over stages.

Input convention (PARITY-CRITICAL): the reference feeds images in **[0, 1]**
directly — `metrics.py:25-31` uses `to_tensor` with no remap, and the
`z_score` shift/scale buffers are applied to that range as-is. The upstream
richzhang convention is [-1, 1]; replicating the reference means NOT
remapping here. The reference's training-time eval uses the **alex**
backbone (`train.py:375`, default net_type), offline `metrics.py:74` uses
**vgg**; both are provided.

Weights are licensed artifacts the reference downloads at runtime
(torchvision backbones + the LPIPS linear heads); this module loads them
from a local file instead (zero-egress TPU pods):

  * `convert_torch_weights(backbone_pth, lpips_pth, out_npz, net_type)` —
    one-time import of the torch checkpoints (torch CPU only needed here),
  * `load_lpips_weights(npz)` — runtime load, no torch,
  * `synthetic_lpips_params(key, net_type)` — random-but-fixed weights so
    tests and smoke runs exercise the exact compute graph without the
    artifacts.

Numerical parity with the torch graph (same weights end-to-end through the
converter) is asserted by tests/test_lpips_parity.py.

The metric itself is jittable and differentiable.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_channels, n_convs) per stage; stages end before pool.
VGG16_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# AlexNet features (torchvision layout): per conv (cout, kernel, stride, pad);
# a stage ends after each conv+ReLU; pools sit after stages 0, 1 and 4
# (`networks.py:78-86` target_layers [2, 5, 8, 10, 12]).
ALEX_CONVS: Tuple[Tuple[int, int, int, int], ...] = (
    (64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1),
)
_ALEX_POOL_AFTER = (0, 1)  # max-pool 3x3/2 after these stages (not the last)

# ImageNet normalization as used by LPIPS ("shift"/"scale" buffers),
# applied to [0,1] inputs exactly as the reference does (`networks.py:40-51`).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["conv_w", "conv_b", "lin_w"],
    meta_fields=["net_type"],
)
@dataclasses.dataclass(frozen=True)
class LpipsParams:
    conv_w: Tuple[jnp.ndarray, ...]   # each [kh, kw, cin, cout]
    conv_b: Tuple[jnp.ndarray, ...]
    lin_w: Tuple[jnp.ndarray, ...]    # per stage [c] (1x1 conv weights, non-neg)
    net_type: str = "vgg"             # 'vgg' | 'alex' — static (jit cache key)


def _stage_channels(net_type: str = "vgg") -> List[int]:
    if net_type == "alex":
        return [c for c, _k, _s, _p in ALEX_CONVS]
    return [c for c, _ in VGG16_STAGES]


def _maxpool(h, window=2, stride=2):
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )


def vgg16_features(params: LpipsParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [H, W, 3] in [0, 1] (reference input convention). Returns the 5
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
            h = _maxpool(h)
    return feats


def alexnet_features(params: LpipsParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """torchvision `alexnet().features` stages (post-ReLU taps,
    `networks.py:78-86`)."""
    h = (x - _SHIFT) / _SCALE
    h = h[None]
    feats = []
    for i, (cout, k, s, p) in enumerate(ALEX_CONVS):
        h = jax.lax.conv_general_dilated(
            h, params.conv_w[i], window_strides=(s, s),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params.conv_b[i]
        h = jax.nn.relu(h)
        feats.append(h[0])
        if i in _ALEX_POOL_AFTER:
            h = _maxpool(h, window=3, stride=2)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return f / (jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + eps)


@jax.jit
def lpips(params: LpipsParams, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between two [H, W, 3] images in [0, 1] (fed to the
    network as-is — the reference convention, see module docstring)."""
    features = alexnet_features if params.net_type == "alex" else vgg16_features
    fx = features(params, img1)
    fy = features(params, img2)
    total = jnp.zeros(())
    for f1, f2, w in zip(fx, fy, params.lin_w):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def synthetic_lpips_params(
    key: Optional[jax.Array] = None, net_type: str = "vgg"
) -> LpipsParams:
    """Deterministic random weights with backbone shapes (tests/smoke only)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    conv_w, conv_b = [], []
    cin = 3
    if net_type == "alex":
        specs = [(cout, k) for cout, k, _s, _p in ALEX_CONVS]
    else:
        specs = [(cout, 3) for cout, n in VGG16_STAGES for _ in range(n)]
    for cout, k in specs:
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (k, k, cin, cout)) * (1.0 / np.sqrt(k * k * cin))
        conv_w.append(w)
        conv_b.append(jnp.zeros((cout,)))
        cin = cout
    lin = []
    for c in _stage_channels(net_type):
        key, sub = jax.random.split(key)
        lin.append(jax.random.uniform(sub, (c,)) * 0.1)
    return LpipsParams(tuple(conv_w), tuple(conv_b), tuple(lin), net_type)


def convert_torch_weights(
    backbone_pth: str, lpips_pth: str, out_npz: str, net_type: str = "vgg"
) -> str:
    """One-time conversion: torchvision backbone state dict + LPIPS linear
    checkpoint → a single npz in this module's layout.

    `lpips_pth` keys follow the richzhang release (`lin{i}.model.1.weight`,
    `lpipsPyTorch/modules/utils.py:11-30`); plain `{i}.weight` (post-rename)
    is accepted too."""
    import torch

    sd = torch.load(backbone_pth, map_location="cpu", weights_only=True)
    lin = torch.load(lpips_pth, map_location="cpu", weights_only=True)
    out = {"net_type": np.array(net_type)}
    conv_keys = sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]),
    )
    for i, k in enumerate(conv_keys):
        w = sd[k].numpy()  # [cout, cin, kh, kw] → HWIO
        out[f"conv_w_{i}"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv_b_{i}"] = sd[k.replace("weight", "bias")].numpy()
    n_stages = len(_stage_channels(net_type))
    for i in range(n_stages):
        for key in (f"lin{i}.model.1.weight", f"{i}.weight", f"lin{i}.weight"):
            if key in lin:
                out[f"lin_w_{i}"] = np.maximum(lin[key].numpy().reshape(-1), 0.0)
                break
        else:
            raise KeyError(f"no linear-head weight for stage {i} in {lpips_pth}")
    np.savez(out_npz, **out)
    return out_npz


def load_lpips_weights(npz_path: str) -> LpipsParams:
    data = np.load(npz_path)
    net_type = str(data["net_type"]) if "net_type" in data else "vgg"
    n_convs = (
        len(ALEX_CONVS) if net_type == "alex" else sum(n for _, n in VGG16_STAGES)
    )
    conv_w = tuple(jnp.asarray(data[f"conv_w_{i}"]) for i in range(n_convs))
    conv_b = tuple(jnp.asarray(data[f"conv_b_{i}"]) for i in range(n_convs))
    lin_w = tuple(
        jnp.asarray(data[f"lin_w_{i}"])
        for i in range(len(_stage_channels(net_type)))
    )
    return LpipsParams(conv_w, conv_b, lin_w, net_type)


def maybe_load_default() -> Optional[LpipsParams]:
    """Load from $GSAVATARS_LPIPS_WEIGHTS if set and present."""
    import os

    path = os.environ.get("GSAVATARS_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return load_lpips_weights(path)
    return None
