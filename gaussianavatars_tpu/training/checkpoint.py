"""Full training-state checkpointing (resume-capable).

Equivalent of the reference's `torch.save((gaussians.capture(), iteration))`
→ `chkpnt{iter}.pth` (`train.py:287-289`, `scene/gaussian_model.py:81-117`):
the whole `TrainState` pytree — Gaussian parameters, alive/binding masks,
densification statistics, Adam moments (Gaussian + FLAME + color net),
contrastive cache, PRNG key — flattened by key-path into one `.npz`.

Because the framework stores parameters in fixed-capacity padded buffers,
restore is exact: no optimizer surgery is needed (the reference's in-place
moment pruning, `scene/gaussian_model.py:355-430`, does not exist here).
"""
from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_train_state(path: str, state, iteration: int) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {"__iteration__": np.asarray(iteration)}
    for kp, leaf in leaves:
        out[_path_str(kp)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **out)


def load_train_state(path: str, template) -> Tuple[object, int]:
    """Restore into the structure of `template` (a TrainState with the same
    capacity/options). Returns (state, iteration)."""
    data = np.load(path, allow_pickle=False)
    iteration = int(data["__iteration__"])
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, tleaf in paths:
        key = _path_str(kp)
        if key not in data.files:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if arr.shape != tuple(np.shape(tleaf)):
            raise ValueError(
                f"checkpoint leaf {key} has shape {arr.shape}, template "
                f"{np.shape(tleaf)} — was the capacity or config changed?"
            )
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(tleaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), iteration


def latest_checkpoint(model_path: str) -> Optional[str]:
    """Find `chkpnt{iter}.npz` with the highest iteration."""
    best, best_it = None, -1
    if not os.path.isdir(model_path):
        return None
    for name in os.listdir(model_path):
        m = re.fullmatch(r"chkpnt(\d+)\.npz", name)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(model_path, name)
    return best
