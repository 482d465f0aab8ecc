"""Mesh binding: FLAME vertices → per-triangle frames driving Gaussians.

The functional core of the reference's `FlameGaussianModel`
(`scene/flame_gaussian_model.py:116-153`): given posed vertices, compute each
triangle's centre, orientation (TBN frame), scale, and quaternion. Gradients
flow through these frames from rendered pixels back to FLAME pose/expression
parameters (SURVEY.md §3.3).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.quaternion import rotmat_to_quat
from ..ops.transforms import compute_face_orientation
from .gaussians import FaceFrames


def face_frames(verts: jnp.ndarray, faces: jnp.ndarray) -> FaceFrames:
    """Per-triangle binding frames for one timestep.

    Args:
      verts: [V, 3] posed FLAME vertices.
      faces: [F, 3] int32.
    """
    tri = verts[faces]                       # [F, 3, 3]
    center = tri.mean(axis=1)
    orien_mat, scaling = compute_face_orientation(verts, faces)
    orien_quat = rotmat_to_quat(orien_mat)
    return FaceFrames(
        center=center, orien_mat=orien_mat, orien_quat=orien_quat, scaling=scaling
    )
