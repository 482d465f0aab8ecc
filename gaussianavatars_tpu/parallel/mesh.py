"""Device mesh construction.

The reference is single-GPU with no collectives (SURVEY.md §2.5); here the
scaling axes are:

  * ``data`` — cameras per step (data parallelism; Gaussians replicated,
    gradients psum'd over ICI/DCN),
  * ``tile`` — image tile rows (the sequence/context-parallel analogue:
    pixels are the long axis; each device bins + composites only its
    resident tile rows and the image is all-gathered for the loss).

Gaussian-axis sharding (projection/binning sharded over splats) rides the
``tile`` axis in a dual role — see ``parallel/sharded.py`` (``gauss_shard``)
and its exact-equivalence test in ``tests/test_sharded.py``; at ≤100k
Gaussians projection is <1% of the step, so tiles+data still carry most of
the scaling (SURVEY.md §5 long-context entry).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_device_mesh(
    data: int = 1,
    tile: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with axes ('data', 'tile'). `tile` defaults to filling all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        tile = n // data
    if data * tile != n:
        raise ValueError(f"data*tile = {data * tile} != {n} devices")
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))
