"""Real spherical harmonics evaluation, degrees 0-3 (pure JAX).

TPU-first formulation: rather than the scalar Horner-style accumulation of the
reference (`utils/sh_utils.py:57-112`), we build the SH *basis matrix*
``B[N, K]`` once per view and contract it against the coefficient tensor with a
single einsum ``B[N,K] · sh[N,3,K] → rgb[N,3]`` — a batched matmul XLA maps
onto the MXU, with the basis construction fused into surrounding elementwise
work. Coefficients are the standard real-SH constants (same math as the
PlenOctree/3DGS lineage).
"""
from __future__ import annotations

import jax.numpy as jnp

# Standard real spherical harmonic constants (degree 0..3).
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)

MAX_SH_DEGREE = 3


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    Args:
      dirs: [..., 3] unit direction vectors.
      degree: static int in [0, 3].
    Returns:
      [..., (degree+1)**2] basis values.
    """
    if not 0 <= degree <= MAX_SH_DEGREE:
        raise ValueError(f"sh degree must be in [0, {MAX_SH_DEGREE}], got {degree}")
    shape = dirs.shape[:-1]
    ones = jnp.ones(shape, dirs.dtype)
    cols = [C0 * ones]
    if degree >= 1:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        cols += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        cols += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    return jnp.stack(cols, axis=-1)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH coefficients → values along directions.

    Args:
      sh: [..., C, K_total] coefficients (K_total >= (degree+1)**2).
      dirs: [..., 3] unit directions.
      degree: active SH degree (static).
    Returns:
      [..., C] evaluated values (no +0.5 shift; see `eval_sh_color`).
    """
    k = num_sh_coeffs(degree)
    basis = sh_basis(dirs, degree)
    return jnp.einsum("...k,...ck->...c", basis, sh[..., :k])


def eval_sh_color(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH → RGB with the 3DGS +0.5 shift and clamp-from-below at 0.

    Matches the in-kernel SH path of the CUDA rasterizer that the reference
    invokes (`gaussian_renderer/__init__.py:69-83`).
    """
    rgb = eval_sh(sh, dirs, degree) + 0.5
    return jnp.maximum(rgb, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term: colour → degree-0 coefficient."""
    return (rgb - 0.5) / C0


def sh0_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
