"""Camera and geometry transforms (pure JAX / numpy-friendly).

Conventions match the reference so cameras, PLYs and renders are directly
comparable (`utils/graphics_utils.py:31-77`): OpenCV-style camera (x right,
y down, z forward), world→view built from COLMAP-style (R, t), and the 3DGS
projection matrix with z_sign=+1 mapping depth to [0, zfar/(zfar-znear)].

Unlike the reference (which stores row-major-transposed matrices and
right-multiplies row vectors, `scene/cameras.py:39-44`), we store standard
column-vector matrices and left-multiply: ``p_view = W2V @ [p; 1]``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def world_to_view(R, t, translate=(0.0, 0.0, 0.0), scale: float = 1.0) -> jnp.ndarray:
    """World→view 4x4 from COLMAP-convention (R, t).

    R is the camera-to-world rotation (COLMAP stores its transpose; the
    reference passes R already transposed, `scene/dataset_readers.py`), t the
    world-to-view translation. `translate`/`scale` recentre the scene the same
    way as `getWorld2View2` (`utils/graphics_utils.py:38-48`).
    """
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    translate = jnp.asarray(translate, jnp.float32)

    Rt = jnp.eye(4, dtype=jnp.float32)
    Rt = Rt.at[:3, :3].set(R.T)
    Rt = Rt.at[:3, 3].set(t)
    # Recentre/scale the camera centre in world space.
    cam_center = -R @ t  # C2W translation of inv(Rt)
    cam_center = (cam_center + translate) * scale
    new_t = -R.T @ cam_center
    return Rt.at[:3, 3].set(new_t)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> jnp.ndarray:
    """3DGS perspective projection (z forward, depth in [0, f/(f-n)]).

    Same element layout as `getProjectionMatrix` (`utils/graphics_utils.py:51-71`)
    in column-vector convention.
    """
    tan_hx = math.tan(fovx / 2)
    tan_hy = math.tan(fovy / 2)
    P = jnp.zeros((4, 4), jnp.float32)
    P = P.at[0, 0].set(1.0 / tan_hx)
    P = P.at[1, 1].set(1.0 / tan_hy)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    P = P.at[3, 2].set(1.0)
    return P


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def transform_points(mat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to [..., 3] points (homogeneous, w-divide)."""
    p = pts @ mat[:3, :3].T + mat[:3, 3]
    w = pts @ mat[3:4, :3].T + mat[3, 3]
    return p / (w + 1e-7)


def _safe_normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps))


def compute_face_orientation(verts: jnp.ndarray, faces: jnp.ndarray):
    """Per-triangle orthonormal frame + isotropic scale for mesh binding.

    The TBN-style frame of the reference (`utils/graphics_utils.py:116-135`):
    axis0 = normalized first edge, axis1 = face normal, axis2 = their (negated)
    cross product; scale = (|e1| + triangle height along axis2) / 2.

    Args:
      verts: [..., V, 3]; faces: [F, 3] int.
    Returns:
      (R [..., F, 3, 3] column-frames, scale [..., F, 1])
    """
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]

    a0 = _safe_normalize(v1 - v0)
    a1 = _safe_normalize(jnp.cross(a0, v2 - v0))
    a2 = -_safe_normalize(jnp.cross(a1, a0))
    R = jnp.stack([a0, a1, a2], axis=-1)  # columns

    e1_len = jnp.linalg.norm(v1 - v0, axis=-1, keepdims=True)
    height = jnp.abs(jnp.sum(a2 * (v2 - v0), axis=-1, keepdims=True))
    scale = (e1_len + height) / 2
    return R, scale


def compute_face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised per-face normals [..., F, 3]."""
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]
    return jnp.cross(v1 - v0, v2 - v0)


def compute_vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via segment-sum scatter (no atomics)."""
    fn = compute_face_normals(verts, faces)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[..., faces[:, k], :].add(fn)
    fallback = jnp.array([0.0, 0.0, 1.0], verts.dtype)
    n2 = jnp.sum(vn * vn, axis=-1, keepdims=True)
    vn = jnp.where(n2 > 1e-20, vn, fallback)
    return _safe_normalize(vn)
