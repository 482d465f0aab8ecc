"""Linear blend skinning math in pure JAX (SMPL/FLAME family).

Functional equivalents of `flame_model/lbs.py`: axis-angle → rotation
(Rodrigues), shape blendshapes, joint regression, kinematic-chain rigid
transforms, and skinning. All functions are batched over a leading B axis and
fully differentiable (gradients flow from vertices back to pose/shape/expr,
which are optimizer parameter groups in training — SURVEY.md §3.3).

FLAME's kinematic tree has 5 joints (global, neck, jaw, eye_l, eye_r); the
chain composition is unrolled as a Python loop over the static `parents`
array — XLA sees straight-line code, no scan needed at this depth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batch_rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle [..., 3] → rotation matrices [..., 3, 3]."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + sin * K + (1.0 - cos) * (K @ K)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """[B, L] × [V, 3, L] → [B, V, 3] (one MXU matmul)."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(j_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """[J, V] × [B, V, 3] → [B, J, 3]."""
    return jnp.einsum("bik,ji->bjk", vertices, j_regressor)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,   # [B, J, 3, 3]
    joints: jnp.ndarray,     # [B, J, 3] rest-pose joint locations
    parents: np.ndarray,     # [J] static int (parents[0] == -1)
):
    """Compose the kinematic chain.

    Returns (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]) where
    rel_transforms map rest-pose-relative coordinates to posed space.
    """
    parents = np.asarray(parents)
    J = parents.shape[0]
    rel = [joints[:, 0]] + [joints[:, i] - joints[:, parents[i]] for i in range(1, J)]

    def tmat(R, t):
        B = R.shape[0]
        top = jnp.concatenate([R, t[:, :, None]], axis=2)          # [B, 3, 4]
        bot = jnp.broadcast_to(
            jnp.array([[0.0, 0.0, 0.0, 1.0]], R.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bot], axis=1)

    chain = [tmat(rot_mats[:, 0], rel[0])]
    for i in range(1, J):
        chain.append(chain[parents[i]] @ tmat(rot_mats[:, i], rel[i]))
    transforms = jnp.stack(chain, axis=1)  # [B, J, 4, 4]

    posed_joints = transforms[:, :, :3, 3]
    # Subtract the transported rest joint so the transform acts on rest-pose
    # world coordinates directly.
    transported = jnp.einsum("bjrc,bjc->bjr", transforms[:, :, :3, :3], joints)
    rel_transforms = transforms.at[:, :, :3, 3].add(-transported)
    return posed_joints, rel_transforms


def lbs(
    full_pose: jnp.ndarray,     # [B, J*3] axis-angle
    v_shaped: jnp.ndarray,      # [B, V, 3] shaped template
    posedirs: jnp.ndarray,      # [(J-1)*9, V*3]
    j_regressor: jnp.ndarray,   # [J, V]
    parents: np.ndarray,        # [J] static
    lbs_weights: jnp.ndarray,   # [V, J]
):
    """Full LBS. Returns (verts [B, V, 3], posed_joints [B, J, 3])."""
    B = full_pose.shape[0]
    J = len(parents)
    joints = vertices2joints(j_regressor, v_shaped)
    rot_mats = batch_rodrigues(full_pose.reshape(B, J, 3))
    eye = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)          # [B, (J-1)*9]
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, joints, parents)
    # Per-vertex transform T = Σ_j w_vj A_j, applied in one batched matmul.
    T = jnp.einsum("vj,bjrc->bvrc", lbs_weights, A)
    verts = (
        jnp.einsum("bvrc,bvc->bvr", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    )
    return verts, posed_joints


def vertices2landmarks(
    vertices: jnp.ndarray,       # [B, V, 3]
    faces: jnp.ndarray,          # [F, 3]
    lmk_faces_idx: jnp.ndarray,  # [L]
    lmk_bary: jnp.ndarray,       # [L, 3]
) -> jnp.ndarray:
    """Barycentric landmark interpolation → [B, L, 3]."""
    tri = faces[lmk_faces_idx]               # [L, 3]
    pts = vertices[:, tri]                   # [B, L, 3, 3]
    return jnp.einsum("blfc,lf->blc", pts, lmk_bary)
