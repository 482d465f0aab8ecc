"""Gaussian avatar model state as a functional pytree.

Re-design of the reference `GaussianModel`/`FlameGaussianModel`
(`scene/gaussian_model.py`, `scene/flame_gaussian_model.py`) for XLA:

  * All parameters live in fixed-**capacity** padded arrays with an `alive`
    mask (XLA needs static shapes; densify/prune become masked scatters, not
    reallocations — SURVEY.md §7 design stance).
  * No classes with mutable state: `GaussianParams` (trainable leaves) and
    `GaussianAux` (masks, binding, densification stats) are dataclass pytrees;
    every operation is a pure function.
  * Mesh binding is a pure function of (params, FaceFrames): the reference's
    binding-aware getters (`scene/gaussian_model.py:119-156`) become
    `world_gaussians(params, aux, frames)`.

Activation conventions match the reference exactly: scales = exp(log_scales),
opacity = sigmoid(logit), rotations normalised; bound Gaussians compose the
per-face frame: scale·face_scaling, face_quat ⊗ quat, R_face·x·face_scaling +
face_center.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quaternion import quat_mul, quat_normalize, quat_rotate
from ..ops.sh import num_sh_coeffs, rgb_to_sh0

SH_REST = num_sh_coeffs(3) - 1  # 15


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Trainable per-Gaussian parameters (padded to capacity N)."""

    means: jnp.ndarray          # [N, 3] triangle-local if bound, world otherwise
    log_scales: jnp.ndarray     # [N, 3]
    quats: jnp.ndarray          # [N, 4] raw wxyz (normalised on use)
    sh_dc: jnp.ndarray          # [N, 1, 3]
    sh_rest: jnp.ndarray        # [N, SH_REST, 3]
    logit_opacity: jnp.ndarray  # [N, 1]

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh(self) -> jnp.ndarray:
        """Full SH coefficients [N, K, 3]."""
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianAux:
    """Non-trainable per-Gaussian state (padded to capacity N)."""

    alive: jnp.ndarray            # [N] bool
    binding: jnp.ndarray          # [N] int32 triangle id (0 for unbound models)
    # Densification statistics (reference `scene/gaussian_model.py:539-541`):
    grad_accum: jnp.ndarray       # [N] Σ‖∂L/∂mean2d_ndc‖ over recent steps
    denom: jnp.ndarray            # [N] #steps the Gaussian was visible
    max_radii2d: jnp.ndarray      # [N] float32 max screen radius seen


class FaceFrames(NamedTuple):
    """Per-triangle frame driving bound Gaussians (from the FLAME mesh)."""

    center: jnp.ndarray      # [F, 3]
    orien_mat: jnp.ndarray   # [F, 3, 3]
    orien_quat: jnp.ndarray  # [F, 4] wxyz
    scaling: jnp.ndarray     # [F, 1]


class WorldGaussians(NamedTuple):
    """Activated world-space Gaussians ready for the rasterizer."""

    means: jnp.ndarray    # [N, 3]
    scales: jnp.ndarray   # [N, 3]
    quats: jnp.ndarray    # [N, 4] unit
    opacity: jnp.ndarray  # [N]
    sh: jnp.ndarray       # [N, K, 3]
    alive: jnp.ndarray    # [N] bool


def world_gaussians(
    params: GaussianParams,
    aux: GaussianAux,
    frames: Optional[FaceFrames] = None,
) -> WorldGaussians:
    """Activate parameters and (if bound) compose triangle-local → world.

    Mirrors the binding-aware getters `get_xyz/get_rotation/get_scaling`
    (`scene/gaussian_model.py:119-156`).
    """
    scales = jnp.exp(params.log_scales)
    quats = quat_normalize(params.quats)
    opacity = jax.nn.sigmoid(params.logit_opacity[:, 0])
    if frames is None:
        means = params.means
    else:
        b = aux.binding
        fs = frames.scaling[b]                       # [N, 1]
        fq = frames.orien_quat[b]                    # [N, 4]
        scales = scales * fs
        # R_face·x via the (already gathered) face quaternion — avoids the
        # [N, 3, 3] orien_mat gather + batched einsum (bad TPU layouts).
        means = quat_rotate(fq, params.means) * fs + frames.center[b]
        quats = quat_mul(fq, quats)
    return WorldGaussians(
        means=means, scales=scales, quats=quats, opacity=opacity,
        sh=params.sh, alive=aux.alive,
    )


def local_scales(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.log_scales)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def init_bound(
    num_faces: int,
    capacity: int,
    key: jax.Array,
    per_face: int = 1,
) -> tuple[GaussianParams, GaussianAux]:
    """One Gaussian per mesh triangle, in the local frame (bound mode).

    Mirrors `create_from_pcd` with binding (`scene/gaussian_model.py:178-212`):
    local means at the face centre (origin of the local frame), unit local
    scale (log 0), identity rotation, random colour, opacity 0.1.
    """
    n = num_faces * per_face
    if n > capacity:
        raise ValueError(f"capacity {capacity} < initial count {n}")
    kc, = jax.random.split(key, 1)
    colors = jax.random.uniform(kc, (capacity, 3))

    params = GaussianParams(
        means=jnp.zeros((capacity, 3)),
        log_scales=jnp.zeros((capacity, 3)),
        quats=jnp.zeros((capacity, 4)).at[:, 0].set(1.0),
        sh_dc=rgb_to_sh0(colors)[:, None, :],
        sh_rest=jnp.zeros((capacity, SH_REST, 3)),
        # Explicit dtype: jnp.full with a python float makes a weak-typed
        # array; the first train step strengthens it, changing the jit cache
        # key and silently recompiling every jitted step on its 2nd call.
        logit_opacity=jnp.full((capacity, 1), inverse_sigmoid(0.1), jnp.float32),
    )
    binding = jnp.tile(jnp.arange(num_faces, dtype=jnp.int32), per_face)
    binding = jnp.concatenate(
        [binding, jnp.zeros((capacity - n,), jnp.int32)]
    )
    aux = GaussianAux(
        alive=jnp.arange(capacity) < n,
        binding=binding,
        grad_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii2d=jnp.zeros((capacity,)),
    )
    return params, aux


def init_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    init_scale: Optional[np.ndarray] = None,
) -> tuple[GaussianParams, GaussianAux]:
    """Unbound init from a point cloud (`create_from_pcd`, unbound branch):
    log-scale from 3-NN mean distance, opacity 0.1, colour → SH DC.
    """
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"capacity {capacity} < point count {n}")
    if init_scale is None:
        from ..ops.knn import mean_sq_dist_3nn

        d2 = np.maximum(np.asarray(mean_sq_dist_3nn(jnp.asarray(points))), 1e-7)
        init_scale = np.sqrt(d2)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    log_s = np.log(init_scale)[:, None].repeat(3, axis=1)
    params = GaussianParams(
        means=pad(points.astype(np.float32)),
        log_scales=pad(log_s),
        quats=pad(np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n, 1))),
        sh_dc=pad(np.asarray(rgb_to_sh0(colors))[:, None, :]),
        sh_rest=jnp.zeros((capacity, SH_REST, 3)),
        logit_opacity=pad(np.full((n, 1), float(inverse_sigmoid(0.1)), np.float32)),
    )
    aux = GaussianAux(
        alive=jnp.arange(capacity) < n,
        binding=jnp.zeros((capacity,), jnp.int32),
        grad_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii2d=jnp.zeros((capacity,)),
    )
    return params, aux


def num_alive(aux: GaussianAux) -> jnp.ndarray:
    return jnp.sum(aux.alive.astype(jnp.int32))


def binding_counter(aux: GaussianAux, num_faces: int) -> jnp.ndarray:
    """Live Gaussians per face [F]."""
    return (
        jnp.zeros((num_faces,), jnp.int32)
        .at[aux.binding]
        .add(aux.alive.astype(jnp.int32))
    )
