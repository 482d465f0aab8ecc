"""Dense reference rasterizer: O(N · pixels), pure JAX, differentiable.

Exact (not tiled, not approximated) alpha compositing of all Gaussians against
all pixels, replicating the semantics of the CUDA tile rasterizer the
reference invokes (`gaussian_renderer/__init__.py:86-94`):

  * alpha = min(0.99, opacity · exp(-½ dᵀ conic d)), skipped below 1/255,
  * front-to-back order by camera depth,
  * early termination: a Gaussian whose compositing would drop transmittance
    below 1e-4 is NOT composited and ends the pixel's ray,
  * background blended with the final transmittance.

This is the ground truth that the tiled/Pallas production kernels are tested
against (allclose, forward and backward), and is itself differentiable for
free via autodiff. It is also genuinely useful on its own for small scenes —
XLA turns it into a few large fused element-wise passes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .projection import Projected, project_from_params
from .sh import eval_sh_color_kc

ALPHA_CUTOFF = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    color: jnp.ndarray        # [H, W, 3]
    alpha: jnp.ndarray        # [H, W] accumulated opacity (1 - T_final)
    radii: jnp.ndarray        # [N] int32
    visibility: jnp.ndarray   # [N] bool (radius > 0)


def composite_order(depth: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Front-to-back ordering: indices sorted by depth, culled pushed to back."""
    key = jnp.where(mask, depth, jnp.inf)
    return jnp.argsort(key)


def pixel_alphas(
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    radius: jnp.ndarray | None = None,
    tile_shape: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Gaussian falloff alphas for a set of pixels.

    Args:
      mean2d [N,2], conic [N,3], opacity [N]; px, py: [P] pixel centres.
      radius/tile_shape: if given, emulate tile-rect culling — a Gaussian only
        reaches pixels whose (tile_h, tile_w) tile intersects its square
        radius bbox, exactly like the tiled production path (and the CUDA
        rasterizer, which drops >3σ tails outside the binned rect).
    Returns: [P, N] alphas with the 1/255 cutoff and 0.99 clamp applied.
    """
    dx = px[:, None] - mean2d[None, :, 0]
    dy = py[:, None] - mean2d[None, :, 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (a[None] * dx * dx + c[None] * dy * dy) - b[None] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    # Positive power (outside the ellipse's numeric domain) and tiny alphas
    # are skipped, exactly as in the CUDA kernel.
    use = (power <= 0.0) & (alpha >= ALPHA_CUTOFF)
    if tile_shape is not None and radius is not None:
        th, tw = tile_shape
        r = radius.astype(jnp.float32)
        tminx = jnp.floor((mean2d[:, 0] - r) / tw)
        tmaxx = jnp.floor((mean2d[:, 0] + r) / tw)
        tminy = jnp.floor((mean2d[:, 1] - r) / th)
        tmaxy = jnp.floor((mean2d[:, 1] + r) / th)
        ptx = jnp.floor(px / tw)[:, None]
        pty = jnp.floor(py / th)[:, None]
        in_rect = (
            (ptx >= tminx[None]) & (ptx <= tmaxx[None])
            & (pty >= tminy[None]) & (pty <= tmaxy[None])
        )
        use = use & in_rect
    return jnp.where(use, alpha, 0.0)


def composite_pixels(
    alphas: jnp.ndarray,   # [P, N] in compositing (front-to-back) order
    colors: jnp.ndarray,   # [N, 3] in the same order
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back compositing with early termination.

    Returns (rgb [P,3], final transmittance [P]).
    """
    one_minus = 1.0 - alphas
    # Transmittance *before* each Gaussian, assuming everything so far
    # composited. Correct up to (and including) the termination point, which
    # is all that matters: beyond it every weight is forced to zero.
    t_before = jnp.concatenate(
        [jnp.ones_like(one_minus[:, :1]), jnp.cumprod(one_minus[:, :-1], axis=1)], axis=1
    )
    test_t = t_before * one_minus
    # A Gaussian triggers termination if compositing it would cross T_EPS; it
    # is itself excluded and so is everything behind it.
    trigger = (alphas > 0.0) & (test_t < T_EPS)
    stopped = jnp.cumsum(trigger.astype(jnp.int32), axis=1) > 0  # inclusive
    contrib = (alphas > 0.0) & ~stopped

    ealpha = jnp.where(contrib, alphas, 0.0)
    t_eff = jnp.concatenate(
        [jnp.ones_like(ealpha[:, :1]), jnp.cumprod(1.0 - ealpha[:, :-1], axis=1)], axis=1
    )
    weights = ealpha * t_eff  # [P, N]
    rgb = weights @ colors
    t_final = jnp.prod(1.0 - ealpha, axis=1)
    return rgb, t_final


def render_dense(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacity: jnp.ndarray,
    camera,
    bg_color: jnp.ndarray,
    sh: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    colors: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    alive: Optional[jnp.ndarray] = None,
    projected: Optional[Projected] = None,
    tile_cull: Optional[tuple[int, int]] = None,
) -> RenderOutput:
    """Render one view densely. Either `sh` [N,K,3] or `colors` [N,3].

    `tile_cull=(tile_h, tile_w)` emulates the tiled path's rect culling for
    exact parity testing.
    """
    if projected is None:
        projected = project_from_params(
            means3d, scales, quats, camera, scale_modifier, alive=alive
        )
    if colors is None:
        if sh is None:
            raise ValueError("provide sh or colors")
        dirs = means3d - camera.camera_center
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        # sh layout [N, K, 3] → eval wants [N, 3, K]
        colors = eval_sh_color_kc(sh, dirs, sh_degree)

    H, W = camera.height, camera.width
    order = composite_order(projected.depth, projected.mask)
    mean2d_s = projected.mean2d[order]
    conic_s = projected.conic[order]
    op_s = jnp.where(projected.mask, opacity, 0.0)[order]
    colors_s = colors[order]

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    radius_s = projected.radius[order] if tile_cull is not None else None
    alphas = pixel_alphas(
        mean2d_s, conic_s, op_s, px, py, radius=radius_s, tile_shape=tile_cull
    )
    rgb, t_final = composite_pixels(alphas, colors_s)
    rgb = rgb + t_final[:, None] * bg_color[None, :]

    return RenderOutput(
        color=rgb.reshape(H, W, 3),
        alpha=(1.0 - t_final).reshape(H, W),
        radii=projected.radius,
        visibility=projected.radius > 0,
    )
