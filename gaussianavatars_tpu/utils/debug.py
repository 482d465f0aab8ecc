"""Debug hooks (SURVEY.md §5: anomaly detection / sanitizer analogues).

The reference exposes `--detect_anomaly` (torch autograd anomaly mode,
`train.py:423-424`) and a rasterizer `debug` flag. TPU equivalents:

  * `enable_nan_debugging()` — `jax.config.jax_debug_nans`: every jitted
    function re-runs eagerly on NaN and points at the producing primitive;
  * `checked(fn)` — wraps a function with `checkify` so index/NaN errors
    become returned errors instead of silent corruption;
  * `assert_finite(tree)` — host-side finite check over a pytree (the
    analogue of the reference's finite assertions under anomaly mode,
    `utils/graphics_utils.py:154-155`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def checked(fn, errors=None):
    """checkify-wrap `fn`; returns (err, out) on call."""
    from jax.experimental import checkify

    errors = errors if errors is not None else checkify.float_checks
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree: Any, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if arr.dtype.kind == "f" and not bool(jnp.isfinite(arr).all()):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
