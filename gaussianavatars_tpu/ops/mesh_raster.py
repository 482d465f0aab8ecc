"""Differentiable-enough triangle rasterizer for mesh previews (pure JAX).

TPU-native replacement for nvdiffrast as the reference uses it — flat-shaded
FLAME mesh previews in the viewers and `render.py --render_mesh` overlays
(`mesh_renderer/__init__.py:214-274`). Not in the training loss path, so the
goal is a correct z-buffered face-ID/barycentric rasterization, not a
speed-of-light kernel.

Algorithm (XLA-friendly, no atomics): chunks of triangles against all
pixels; for each (pixel, triangle) pair in a chunk compute the interpolated
depth, keep the per-pixel min-depth + face id via a running reduce carried
through a `lax.scan` over chunks, then recompute the winning triangle's
barycentrics once per pixel after the scan. The chunk size is capped so the
[chunk, pixels] intermediates stay within a fixed memory budget at any
resolution. Backface culling matches nvdiffrast's convention
(counter-clockwise front faces in clip space; disabled by default like
`dr.rasterize`).

Outputs carry what `dr.rasterize`'s (u, v, z/w, face_id+1) carries
(`mesh_renderer/__init__.py:225-232`) in a different convention: `face_id`
here is 0-based with **-1** for misses (plus a bool `mask`), and the
(u, v) barycentrics are **screen-space** weights of vertices 1 and 2 — not
nvdiffrast's perspective-correct ones. Depth is unaffected (z_ndc is affine
in screen space); interpolating general vertex attributes with these
weights is perspective-distorted at grazing angles — fine for the
flat-shaded previews this module serves.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import _safe_normalize, compute_face_normals


class RastOut(NamedTuple):
    bary: jnp.ndarray      # [H, W, 2] (u, v) of the winning triangle
    depth: jnp.ndarray     # [H, W] clip-space z/w (inf = miss)
    face_id: jnp.ndarray   # [H, W] int32, -1 = miss
    mask: jnp.ndarray      # [H, W] bool hit mask


def rasterize_mesh(
    verts_clip: jnp.ndarray,   # [V, 4] clip-space positions
    faces: jnp.ndarray,        # [F, 3] int32
    height: int,
    width: int,
    chunk: int = 2048,
    pair_budget: int = 48 << 20,
) -> RastOut:
    """Z-buffer rasterization of a triangle mesh.

    `pair_budget` caps chunk×pixels so the per-chunk [C, P] intermediates
    stay ≤ ~4·budget bytes regardless of resolution (an 802×550 preview at
    2× supersampling has P ≈ 1.76M pixels; an uncapped chunk of 2048 would
    materialize multi-GB buffers).
    """
    v = verts_clip
    w = v[:, 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = v[:, :3] / w_safe
    # NDC → pixel centres (y down, same convention as the splatting path).
    px = (ndc[:, 0] + 1.0) * 0.5 * width - 0.5
    py = (ndc[:, 1] + 1.0) * 0.5 * height - 0.5
    pz = ndc[:, 2]
    behind = v[:, 3] <= 1e-6

    tri_xy = jnp.stack([px, py], -1)[faces]          # [F, 3, 2]
    tri_z = pz[faces]                                 # [F, 3]
    tri_behind = jnp.any(behind[faces], axis=1)       # [F]

    f = faces.shape[0]
    n_pix = height * width
    chunk = max(8, min(chunk, pair_budget // max(n_pix, 1)))
    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f
    tri_xy = jnp.pad(tri_xy, ((0, pad), (0, 0), (0, 0)))
    tri_z = jnp.pad(tri_z, ((0, pad), (0, 0)), constant_values=jnp.inf)
    tri_dead = jnp.pad(tri_behind, (0, pad), constant_values=True)

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # [P, 2]

    def bary_weights(xy, qx, qy):
        """Screen-space barycentrics of pixels (qx, qy) in triangles `xy`.

        xy: [..., 3, 2]; qx/qy broadcast against the leading dims. Returns
        (l1, l2, valid) — the weights of vertices 1 and 2, and the
        inside-with-nondegenerate-area mask.
        """
        a, b, c = xy[..., 0, :], xy[..., 1, :], xy[..., 2, :]

        def edge(p0, p1):
            d = p1 - p0
            return (d[..., 0:1] * (qy - p0[..., 1:2])
                    - d[..., 1:2] * (qx - p0[..., 0:1]))

        w0 = edge(b, c)   # opposite a
        w1 = edge(c, a)   # opposite b
        w2 = edge(a, b)   # opposite c
        area = (
            (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1])
            - (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0])
        )[..., None]
        area_safe = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        inside = (
            ((w0 >= 0) & (w1 >= 0) & (w2 >= 0))
            | ((w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        ) & (jnp.abs(area) > 1e-12)
        return w1 / area_safe, w2 / area_safe, inside

    def chunk_step(carry, tri):
        # Only (depth, face id) ride the scan: the winner's barycentrics are
        # recomputed once per pixel after the scan, so the body is a pure
        # producer chain into two reductions — nothing [C, P]-sized needs to
        # survive the chunk, and there are no [C, P] gathers.
        best_z, best_id = carry
        xy, z, dead, fid = tri          # [C,3,2], [C,3], [C], [C]
        l1, l2, inside = bary_weights(
            xy, pix[None, :, 0], pix[None, :, 1]
        )                               # [C, P]
        inside = inside & ~dead[:, None]
        l0 = 1.0 - l1 - l2
        zpix = l0 * z[:, 0:1] + l1 * z[:, 1:2] + l2 * z[:, 2:3]  # [C, P]
        zpix = jnp.where(inside & (zpix > -1.0), zpix, jnp.inf)
        # Winner within the chunk (min + argmin fuse over the producer),
        # then against the carry.
        pz_best = jnp.min(zpix, axis=0)                     # [P]
        ci = jnp.argmin(zpix, axis=0)                       # [P]
        sel = pz_best < best_z
        best_id = jnp.where(sel, fid[ci], best_id)
        best_z = jnp.where(sel, pz_best, best_z)
        return (best_z, best_id), None

    p = pix.shape[0]
    init = (
        jnp.full((p,), jnp.inf),
        jnp.full((p,), -1, jnp.int32),
    )
    fids = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(n_chunks, chunk)
    tris = (
        tri_xy.reshape(n_chunks, chunk, 3, 2),
        tri_z.reshape(n_chunks, chunk, 3),
        tri_dead.reshape(n_chunks, chunk),
        fids,
    )
    (best_z, best_id), _ = jax.lax.scan(chunk_step, init, tris)
    # Barycentrics of the winning triangle, one triangle per pixel.
    win_xy = tri_xy[jnp.maximum(best_id, 0)]                 # [P, 3, 2]
    u, v_, _ = bary_weights(win_xy, pix[:, 0:1], pix[:, 1:2])
    hit = (best_id >= 0)[:, None]
    best_uv = jnp.where(hit, jnp.concatenate([u, v_], -1), 0.0)
    return RastOut(
        bary=best_uv.reshape(height, width, 2),
        depth=best_z.reshape(height, width),
        face_id=best_id.reshape(height, width),
        mask=(best_id >= 0).reshape(height, width),
    )


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Per-face unit normals (flat shading, `mesh_renderer/__init__.py:141-181`)."""
    return _safe_normalize(compute_face_normals(verts, faces))


def render_mesh_preview(
    verts: jnp.ndarray,        # [V, 3] world space
    faces: jnp.ndarray,        # [F, 3]
    camera,                    # data.cameras.Camera
    color: tuple = (1.0, 1.0, 1.0),
    background: Optional[jnp.ndarray] = None,
    lighting: str = "front",   # 'front' | 'constant'
    chunk: int = 2048,
    antialias: int = 2,        # supersampling factor (1 = off)
):
    """Flat-shaded mesh preview through a 3DGS camera.

    Equivalent of `NVDiffRenderer.render_from_camera` (diffuse term only,
    `mesh_renderer/__init__.py:141-212`): RGBA output, front-lit flat
    shading, miss pixels filled with `background`.

    `antialias` replaces `dr.antialias` (`mesh_renderer/__init__.py:267`):
    the scene is rasterized at `antialias×` resolution and box-filtered
    down, giving fractional silhouette/edge coverage on BOTH sides of every
    edge (nvdiffrast's analytic pass smooths the same pixels; ordered
    supersampling is the natural XLA formulation — the projection is
    resolution-independent, so only the pixel grid scales). Preview-only:
    cost is antialias², fine at viewer resolutions.
    """
    aa = max(int(antialias), 1)
    h, w = camera.height * aa, camera.width * aa
    vh = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], -1)
    verts_clip = vh @ camera.full_proj.T
    rast = rasterize_mesh(verts_clip, faces, h, w, chunk=chunk)

    normals = face_normals(verts, faces)
    n_pix = normals[jnp.maximum(rast.face_id, 0)]        # [H, W, 3]
    if lighting == "front":
        view_dir = (camera.camera_center - verts.mean(0))
        view_dir = view_dir / jnp.linalg.norm(view_dir).clip(1e-12)
        diffuse = jnp.abs(n_pix @ view_dir)[..., None]
    else:
        diffuse = jnp.ones_like(n_pix[..., :1])
    rgb = jnp.asarray(color) * diffuse
    alpha = rast.mask.astype(jnp.float32)[..., None]
    if background is None:
        background = jnp.zeros(3)
    rgb = rgb * alpha + background * (1.0 - alpha)
    n_shaded = n_pix * alpha
    if aa > 1:
        down = lambda x: jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (aa, aa, 1), (aa, aa, 1), "VALID"
        ) * (1.0 / (aa * aa))
        rgb = down(rgb)
        alpha = down(alpha)
        n_shaded = down(n_shaded)
        # face_id / depth stay hard (ID buffers cannot be averaged): take
        # the top-left sample of each cell.
        face_id = rast.face_id[::aa, ::aa]
        depth = rast.depth[::aa, ::aa]
    else:
        face_id = rast.face_id
        depth = rast.depth
    return {
        "rgba": jnp.concatenate([rgb, alpha], -1),
        "diffuse": rgb,
        "normal": n_shaded,
        "face_id": face_id,
        "depth": depth,
    }
