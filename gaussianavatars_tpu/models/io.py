"""Load trained avatars from disk (PLY + flame_param.npz sidecar).

Mirrors the reference load path used by `render.py` and the viewers
(`scene/gaussian_model.py:288-338`, `scene/flame_gaussian_model.py:225-268`):
a `point_cloud.ply` with per-Gaussian attributes (+ `binding_0` when bound)
and, beside it, `flame_param.npz` with the trained FLAME sequence. Loaded
arrays are padded to a capacity with an alive mask (the framework's static-
shape convention).
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.ply import load_gaussian_ply
from .gaussians import SH_REST, GaussianAux, GaussianParams


def _pad(x: np.ndarray, capacity: int) -> jnp.ndarray:
    out = np.zeros((capacity,) + x.shape[1:], x.dtype)
    out[: x.shape[0]] = x
    return jnp.asarray(out)


def load_avatar(
    ply_path: str,
    capacity: Optional[int] = None,
    motion_path: str = "",
    disable_fid: Optional[np.ndarray] = None,
) -> Tuple[GaussianParams, GaussianAux, Optional[Dict[str, np.ndarray]]]:
    """Load (params, aux, flame_table|None) from a checkpoint PLY.

    `motion_path`: override the FLAME pose sequence with another actor's
    `flame_param.npz` (cross-reenactment in the viewers,
    `scene/flame_gaussian_model.py:236-249`). `disable_fid`: face ids whose
    Gaussians are hidden (`:259-266`).
    """
    raw = load_gaussian_ply(ply_path)
    n = raw["means"].shape[0]
    cap = capacity or max(1 << int(np.ceil(np.log2(max(n, 1)))), 1024)
    if n > cap:
        raise ValueError(f"capacity {cap} < point count {n}")

    k_rest = raw["sh_rest"].shape[1]
    sh_rest = raw["sh_rest"]
    if k_rest < SH_REST:  # stored with lower SH degree: zero-pad bands
        sh_rest = np.concatenate(
            [sh_rest, np.zeros((n, SH_REST - k_rest, 3), np.float32)], axis=1
        )
    params = GaussianParams(
        means=_pad(raw["means"], cap),
        log_scales=_pad(raw["log_scales"], cap),
        quats=_pad(raw["quats"], cap),
        sh_dc=_pad(raw["sh_dc"], cap),
        sh_rest=_pad(sh_rest.astype(np.float32), cap),
        logit_opacity=_pad(raw["logit_opacity"], cap),
    )
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    binding = raw["binding"]
    if binding is not None and disable_fid is not None and len(disable_fid):
        alive[:n] &= ~np.isin(binding, np.asarray(disable_fid))
    aux = GaussianAux(
        alive=jnp.asarray(alive),
        binding=_pad(binding.astype(np.int32), cap) if binding is not None
        else jnp.zeros((cap,), jnp.int32),
        grad_accum=jnp.zeros((cap,)),
        denom=jnp.zeros((cap,)),
        max_radii2d=jnp.zeros((cap,)),
    )

    flame_table = None
    side = os.path.join(os.path.dirname(ply_path), "flame_param.npz")
    if binding is not None and os.path.exists(side):
        data = np.load(side, allow_pickle=True)
        flame_table = {k: data[k] for k in data.files}
        if motion_path:
            motion = np.load(motion_path, allow_pickle=True)
            for k in ("expr", "rotation", "neck_pose", "jaw_pose", "eyes_pose",
                      "translation"):
                if k in motion.files:
                    flame_table[k] = motion[k]
    return params, aux, flame_table


def find_latest_iteration(model_path: str) -> int:
    """`searchForMaxIteration` equivalent (`scene/__init__.py` uses it for
    load_iteration=-1)."""
    pc_dir = os.path.join(model_path, "point_cloud")
    best = -1
    if os.path.isdir(pc_dir):
        for name in os.listdir(pc_dir):
            m = re.fullmatch(r"iteration_(\d+)", name)
            if m:
                best = max(best, int(m.group(1)))
    if best < 0:
        raise FileNotFoundError(f"no point_cloud/iteration_* under {model_path}")
    return best


def checkpoint_ply_path(model_path: str, iteration: int = -1) -> str:
    it = find_latest_iteration(model_path) if iteration == -1 else iteration
    return os.path.join(model_path, "point_cloud", f"iteration_{it}", "point_cloud.ply")
