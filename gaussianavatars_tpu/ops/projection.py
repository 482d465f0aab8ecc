"""EWA projection of 3D Gaussians to screen space (pure JAX, differentiable).

Stage 1 of the rasterizer: camera-space transform, near-plane cull, perspective
projection of means, first-order (Jacobian) propagation of the 3D covariance to
a 2D conic, and conservative pixel radii. Replicates the math of the CUDA
`diff-gaussian-rasterization` preprocess that the reference calls through
`GaussianRasterizer` (`gaussian_renderer/__init__.py:86-94`), re-expressed as
one vectorised function over the padded Gaussian axis — entirely VPU-shaped
work that XLA fuses into a handful of elementwise kernels.

All outputs are defined (zero/masked) for culled or padding Gaussians so the
whole pipeline keeps static shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .quaternion import covariance_from_scaling_rotation, covariance_symm6_parts
from ..data.cameras import Camera

# Low-pass filter added to the 2D covariance diagonal: guarantees every
# splat covers at least ~one pixel (same constant as the EWA splatting paper
# and the CUDA kernel).
COV2D_FILTER = 0.3
NEAR_CLIP = 0.2


class Projected(NamedTuple):
    """Screen-space Gaussians. All arrays have leading dim N (padded)."""

    mean2d: jnp.ndarray   # [N, 2] pixel coordinates
    depth: jnp.ndarray    # [N] camera-space z
    conic: jnp.ndarray    # [N, 3] inverse 2D covariance (a, b, c) for axᵀ+2bxy+cyᵀ
    radius: jnp.ndarray   # [N] int32 conservative pixel radius (0 = culled)
    mask: jnp.ndarray     # [N] bool: in frustum, non-degenerate, alive
    cov2d: jnp.ndarray    # [N, 3] the 2D covariance itself (a, b, c)


def ndc_to_pixel(ndc: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1,1] → pixel centre coordinates, 3DGS convention."""
    size = jnp.asarray(size, ndc.dtype)
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: Camera,
    alive: jnp.ndarray | None = None,
) -> Projected:
    """Project N Gaussians into one camera.

    Args:
      means3d: [N, 3] world-space centres.
      cov3d: [N, 3, 3] world-space covariances (from
        `covariance_from_scaling_rotation`, already scale-modified).
      camera: the view.
      alive: optional [N] bool mask for padding Gaussians.
    """
    cv = cov3d.astype(jnp.float32)
    parts = (cv[..., 0, 0], cv[..., 0, 1], cv[..., 0, 2],
             cv[..., 1, 1], cv[..., 1, 2], cv[..., 2, 2])
    return _project_core(means3d, parts, camera, alive)


def _project_core(
    means3d: jnp.ndarray,
    cov_parts,
    camera: Camera,
    alive: jnp.ndarray | None = None,
) -> Projected:
    """Shared projection core; covariance as six scalar arrays (SoA)."""
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    w2v = camera.world_view.astype(f32)
    full = camera.full_proj.astype(f32)

    hi = jax.lax.Precision.HIGHEST  # geometry needs full f32, not TPU bf16 matmul

    # Camera space + near cull.
    t = jnp.matmul(means3d, w2v[:3, :3].T, precision=hi) + w2v[:3, 3]
    depth = t[..., 2]
    in_front = depth > NEAR_CLIP

    # Clip space → NDC → pixels.
    hom = jnp.matmul(means3d, full[:3, :3].T, precision=hi) + full[:3, 3]
    w = jnp.matmul(means3d, full[3, :3], precision=hi) + full[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    ndc = hom[..., :2] * inv_w[..., None]
    mean2d = jnp.stack(
        [ndc_to_pixel(ndc[..., 0], camera.width), ndc_to_pixel(ndc[..., 1], camera.height)],
        axis=-1,
    )

    # EWA: cov2D = J W Σ Wᵀ Jᵀ with the perspective Jacobian J evaluated at a
    # frustum-clamped camera-space point (stabilises J for off-screen outliers).
    # asarray, not f32(...): focal/fov may be traced per-view scalars
    # (parallel/sharded.py's _DeviceCamera) and np.float32(tracer) raises.
    fx = jnp.asarray(camera.focal_x, f32)
    fy = jnp.asarray(camera.focal_y, f32)
    lim_x = 1.3 * camera.tan_half_fovx
    lim_y = 1.3 * camera.tan_half_fovy
    tz = jnp.where(jnp.abs(depth) < 1e-6, 1e-6, depth)
    tx = jnp.clip(t[..., 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[..., 1] / tz, -lim_y, lim_y) * tz
    inv_tz = 1.0 / tz

    # J rows (the third row of the full Jacobian is dropped — depth variance
    # does not affect the image-plane footprint).
    #   J = [[fx/tz, 0, -fx·tx/tz²], [0, fy/tz, -fy·ty/tz²]]
    R = w2v[:3, :3]
    # M = J @ R : two [N, 3] rows, kept as six scalar arrays (SoA — avoids
    # [N, 2, 3]/[N, 3, 3] relayouts; everything below is fusable VPU work).
    j00 = fx * inv_tz
    j11 = fy * inv_tz
    j02 = -fx * tx * inv_tz * inv_tz
    j12 = -fy * ty * inv_tz * inv_tz
    m00 = j00 * R[0, 0] + j02 * R[2, 0]
    m01 = j00 * R[0, 1] + j02 * R[2, 1]
    m02 = j00 * R[0, 2] + j02 * R[2, 2]
    m10 = j11 * R[1, 0] + j12 * R[2, 0]
    m11 = j11 * R[1, 1] + j12 * R[2, 1]
    m12 = j11 * R[1, 2] + j12 * R[2, 2]
    # cov2d entries: a = m0 Σ m0ᵀ, b = m0 Σ m1ᵀ, c = m1 Σ m1ᵀ with the
    # symmetric Σ as scalar arrays.
    c00, c01, c02, c11, c12, c22 = (p.astype(f32) for p in cov_parts)
    s00 = m00 * c00 + m01 * c01 + m02 * c02
    s01 = m00 * c01 + m01 * c11 + m02 * c12
    s02 = m00 * c02 + m01 * c12 + m02 * c22
    s10 = m10 * c00 + m11 * c01 + m12 * c02
    s11 = m10 * c01 + m11 * c11 + m12 * c12
    s12 = m10 * c02 + m11 * c12 + m12 * c22
    a = s00 * m00 + s01 * m01 + s02 * m02 + COV2D_FILTER
    b = s00 * m10 + s01 * m11 + s02 * m12
    c = s10 * m10 + s11 * m11 + s12 * m12 + COV2D_FILTER
    cov2d = jnp.stack([a, b, c], axis=-1)

    det = a * c - b * b
    valid_det = det > 0.0
    inv_det = 1.0 / jnp.where(valid_det, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Conservative radius: 3σ of the major eigenvalue.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1)).astype(jnp.int32)

    mask = in_front & valid_det & (radius > 0)
    if alive is not None:
        mask = mask & alive
    radius = jnp.where(mask, radius, 0)

    return Projected(
        mean2d=mean2d, depth=depth, conic=conic, radius=radius, mask=mask, cov2d=cov2d
    )


def project_from_params(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    camera: Camera,
    scale_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
) -> Projected:
    """Build Σ from (scale, quaternion) and project — all SoA, no [N,3,3]."""
    parts = covariance_symm6_parts(scales * scale_modifier, quats)
    return _project_core(means3d, parts, camera, alive=alive)
