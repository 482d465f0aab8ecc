"""Numerical parity of the JAX LPIPS against the reference torch graph.

The licensed pretrained weights cannot be downloaded in this environment
(zero egress), so parity is proven the strongest available way: build the
REFERENCE's computation graph in torch (torchvision backbone + shift/scale
buffers + unit-normalize + 1x1 linear heads + spatial mean + stage sum,
mirroring /root/reference/lpipsPyTorch/modules/{lpips,networks,utils}.py),
give BOTH frameworks identical weights through the production converter
(`convert_torch_weights`), and require the outputs to agree to f32
tolerance. This validates the converter, stage taps, padding/stride
conventions, pooling, normalization buffers and the [0,1] input convention
end-to-end; only the literal pretrained values remain environment-bound.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gaussianavatars_tpu.metrics.lpips import (
    ALEX_CONVS, VGG16_STAGES, convert_torch_weights, load_lpips_weights, lpips,
)

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_lpips(features_module, target_layers, lin_ws, x, y):
    """The reference LPIPS forward (lpips.py:30-36, networks.py:40-61,
    utils.py:6-8), inlined for the fixture."""

    def feats(t):
        h = (t - _SHIFT) / _SCALE
        out = []
        for i, layer in enumerate(features_module, 1):
            h = layer(h)
            if i in target_layers:
                out.append(h / (h.pow(2).sum(1, keepdim=True).sqrt() + 1e-10))
            if len(out) == len(target_layers):
                break
        return out

    fx, fy = feats(x), feats(y)
    total = torch.zeros(())
    for f1, f2, w in zip(fx, fy, lin_ws):
        d = (f1 - f2) ** 2
        total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean()
    return total


def _rand_images(h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.rand(h, w, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(h, w, 3).astype(np.float32), 0, 1)
    return a, b


def _vgg16_features_torch():
    """torchvision vgg16().features layer layout (cfg 'D')."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(inplace=False)]
            cin = v
    return nn.Sequential(*layers)


def _alexnet_features_torch():
    """torchvision alexnet().features layer layout."""
    import torch.nn as nn

    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2),
    )


@pytest.mark.parametrize("net_type,target_layers", [
    ("vgg", [4, 9, 16, 23, 30]),
    ("alex", [2, 5, 8, 10, 12]),
])
def test_lpips_matches_torch_reference_graph(tmp_path, net_type, target_layers):
    import torch.nn as nn

    torch.manual_seed(0)

    class _Net(nn.Module):
        def __init__(self, features):
            super().__init__()
            self.features = features

    if net_type == "vgg":
        net = _Net(_vgg16_features_torch())
        n_stages, channels = 5, [c for c, _ in VGG16_STAGES]
    else:
        net = _Net(_alexnet_features_torch())
        n_stages, channels = 5, [c for c, *_ in ALEX_CONVS]
    net.eval()

    # Linear heads in the richzhang release format (utils.py:11-30).
    g = torch.Generator().manual_seed(1)
    lin_sd = {
        f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g) * 0.2
        for i, c in enumerate(channels)
    }
    backbone_pth = str(tmp_path / "backbone.pth")
    lin_pth = str(tmp_path / "lin.pth")
    torch.save(net.state_dict(), backbone_pth)
    torch.save(lin_sd, lin_pth)

    npz = convert_torch_weights(
        backbone_pth, lin_pth, str(tmp_path / "w.npz"), net_type=net_type
    )
    params = load_lpips_weights(npz)
    assert params.net_type == net_type

    a, b = _rand_images()
    with torch.no_grad():
        ref = float(_torch_lpips(
            net.features, target_layers,
            [lin_sd[f"lin{i}.model.1.weight"] for i in range(n_stages)],
            torch.from_numpy(a).permute(2, 0, 1)[None],
            torch.from_numpy(b).permute(2, 0, 1)[None],
        ))
    ours = float(lpips(params, jnp.asarray(a), jnp.asarray(b)))
    assert ref > 0
    assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref)), (ours, ref)

    # Identity sanity on the same weights.
    assert float(lpips(params, jnp.asarray(a), jnp.asarray(a))) < 1e-6
