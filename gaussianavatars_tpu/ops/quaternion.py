"""Quaternion and rotation utilities (pure JAX, batched, differentiable).

Convention: quaternions are stored ``(w, x, y, z)`` (scalar-first), matching the
3DGS parameter layout of the reference (`scene/gaussian_model.py:131-144` uses
roma with an xyzw internal convention but exposes wxyz storage; we standardise
on wxyz everywhere and convert only at PLY I/O boundaries, where the layout is
identical).

All functions broadcast over leading batch dimensions and are safe to
differentiate (eps-guarded normalisation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Normalise quaternions to unit norm. q: [..., 4] wxyz."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), eps))
    return q / norm


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b. Both [..., 4] wxyz.

    Composing rotations: ``quat_rotate(quat_mul(a, b), v) ==
    quat_rotate(a, quat_rotate(b, v))`` — i.e. b is applied first.
    """
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] wxyz → rotation matrix [..., 3, 3]."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] → unit quaternion [..., 4] wxyz.

    Branch-free Shepperd-style selection over the four candidate quaternion
    magnitudes (XLA-friendly: no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions, each valid when its pivot is the largest.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw = _safe_sqrt(1.0 + tr) / 2.0
    qx = _safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    qy = _safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    qz = _safe_sqrt(1.0 - m00 - m11 + m22) / 2.0

    c_w = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], -1)
    c_x = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], -1)
    c_y = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], -1)
    c_z = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], -1)

    mags = jnp.stack([qw, qx, qy, qz], -1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([c_w, c_x, c_y, c_z], axis=-2)  # [..., 4cand, 4comp]
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    # Canonicalise sign (w >= 0) for deterministic round-trips.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def build_scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(scale): [..., 3] x [..., 4] → [..., 3, 3].

    Mirrors the covariance factor construction of the reference
    (`utils/general_utils.py:85-110`): Σ = L Lᵀ.
    """
    R = quat_to_rotmat(q)
    return R * scale[..., None, :]


def covariance_from_scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Full 3D covariance Σ = R S Sᵀ Rᵀ : [..., 3, 3].

    Full f32 precision: on TPU the default matmul precision is bf16-based,
    which is not enough for covariance conditioning (the conic inverts this).
    """
    L = build_scaling_rotation(scale, q)
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGHEST)


def covariance_to_symm6(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack symmetric [..., 3, 3] → [..., 6] (upper triangle, 3DGS order)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def symm6_to_covariance(s: jnp.ndarray) -> jnp.ndarray:
    """Unpack [..., 6] → symmetric [..., 3, 3]."""
    c00, c01, c02, c11, c12, c22 = jnp.moveaxis(s, -1, 0)
    row0 = jnp.stack([c00, c01, c02], -1)
    row1 = jnp.stack([c01, c11, c12], -1)
    row2 = jnp.stack([c02, c12, c22], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_symm6_parts(scale: jnp.ndarray, q: jnp.ndarray):
    """Σ = R S² Rᵀ as six scalar arrays (c00, c01, c02, c11, c12, c22).

    SoA formulation of `covariance_from_scaling_rotation` — no [N, 3, 3]
    intermediates, no batched 3×3 matmuls (tiny-dim dots relayout badly on
    TPU); Σ_ij = Σ_k r_ik s_k² r_jk with everything as [N] vectors.
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1 - 2 * (yy + zz)
    r01 = 2 * (xy - wz)
    r02 = 2 * (xz + wy)
    r10 = 2 * (xy + wz)
    r11 = 1 - 2 * (xx + zz)
    r12 = 2 * (yz - wx)
    r20 = 2 * (xz - wy)
    r21 = 2 * (yz + wx)
    r22 = 1 - 2 * (xx + yy)
    s0 = scale[..., 0] * scale[..., 0]
    s1 = scale[..., 1] * scale[..., 1]
    s2 = scale[..., 2] * scale[..., 2]
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return c00, c01, c02, c11, c12, c22
