"""The FLAME head model: teeth augmentation, forward pass, masks, laplacian.

JAX re-design of `FlameHead` (`flame_model/flame.py:63-558`). The model splits
into a host-side constructor (`FlameModel`) that prepares static augmented
arrays once — teeth synthesis, mask tables, laplacian — and a pure jittable
`forward` over a `FlameParams` pytree.

Teeth augmentation (reference `add_teeth`, `flame_model/flame.py:186-483`):
120 vertices in 8 rows of 15 are synthesised from the outer lip rings (two
billboard slabs riding the neck/jaw joints), with lip-averaged shape dirs and
zero pose dirs. Our triangle strips are generated programmatically (same
surface; the reference hand-writes the index table with two irregular
diagonals — a cosmetic difference documented here for the parity audit).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .assets import FlameAssets
from .lbs import blend_shapes, lbs, vertices2landmarks

TEETH_ROWS = 15


class FlameParams(NamedTuple):
    """Pose/shape inputs for a batch of B timesteps."""

    shape: jnp.ndarray        # [S] (shared across timesteps)
    expr: jnp.ndarray         # [B, E]
    rotation: jnp.ndarray     # [B, 3] global axis-angle
    neck: jnp.ndarray         # [B, 3]
    jaw: jnp.ndarray          # [B, 3]
    eyes: jnp.ndarray         # [B, 6]
    translation: jnp.ndarray  # [B, 3]
    static_offset: Optional[jnp.ndarray] = None   # [V, 3]
    dynamic_offset: Optional[jnp.ndarray] = None  # [B, V, 3]


def zero_params(n_shape: int, n_expr: int, batch: int = 1, num_verts: int = 0) -> FlameParams:
    z = jnp.zeros
    return FlameParams(
        shape=z((n_shape,)),
        expr=z((batch, n_expr)),
        rotation=z((batch, 3)),
        neck=z((batch, 3)),
        jaw=z((batch, 3)),
        eyes=z((batch, 6)),
        translation=z((batch, 3)),
        static_offset=z((num_verts, 3)) if num_verts else None,
        dynamic_offset=None,
    )


@dataclasses.dataclass(frozen=True)
class FlameConfig:
    n_shape: int = 300
    n_expr: int = 100
    add_teeth: bool = True


def _strip(a: np.ndarray, b: np.ndarray, flip: bool = False) -> np.ndarray:
    """Triangle strip between two equal-length vertex rows a, b."""
    tris = []
    for i in range(len(a) - 1):
        q = [(a[i], b[i + 1], b[i]), (a[i], a[i + 1], b[i + 1])]
        tris.extend(q)
    tris = np.asarray(tris, np.int32)
    if flip:
        tris = tris[:, ::-1]
    return tris


def _build_teeth(assets: FlameAssets) -> tuple[FlameAssets, Dict[str, np.ndarray]]:
    """Synthesise teeth geometry and extend all per-vertex model arrays."""
    masks = assets.vertex_masks
    vid_up = masks["lip_outside_ring_upper"]
    vid_lo = masks["lip_outside_ring_lower"]
    vt = assets.v_template
    v_up, v_lo = vt[vid_up], vt[vid_lo]

    mean_dist = np.linalg.norm(v_up - v_lo, axis=-1, keepdims=True).mean()
    mid = (v_up + v_lo) / 2
    mid[:, 1] = mid[:, 1].mean()
    mid[:, 2] -= mean_dist * 1.5  # recess behind the lips

    dy = np.array([[0.0, mean_dist, 0.0]], np.float32)
    dz = np.array([[0.0, 0.0, mean_dist]], np.float32)
    up_edge = mid + dy * 0.1
    up_root = up_edge + dy * 2
    lo_edge = mid - dy * 0.1 - dz * 0.4
    lo_root = lo_edge - dy * 2
    thick = dz * 1.0
    rows = [
        up_root, lo_root, up_edge, lo_edge,              # front: rows 0..3
        up_root - thick, up_edge - thick,                # upper back: 4, 5
        lo_root - thick, lo_edge - thick,                # lower back: 6, 7
    ]
    v0 = vt.shape[0]
    v_teeth = np.concatenate(rows, axis=0).astype(np.float32)
    nvt = v_teeth.shape[0]  # 120

    def row_ids(r):
        return np.arange(r * TEETH_ROWS, (r + 1) * TEETH_ROWS, dtype=np.int32) + v0

    ids = {i: row_ids(i) for i in range(8)}
    vid_teeth_upper = np.concatenate([ids[0], ids[2], ids[4], ids[5]])
    vid_teeth_lower = np.concatenate([ids[1], ids[3], ids[6], ids[7]])

    # Faces: front slab (root→edge), back slab, and the occlusal band joining
    # the front and back edges, for each of upper and lower teeth.
    f_upper = np.concatenate([
        _strip(ids[0], ids[2]),                 # front
        _strip(ids[4], ids[5], flip=True),      # back
        _strip(ids[5], ids[2]),                 # biting edge band
    ])
    f_lower = np.concatenate([
        _strip(ids[1], ids[3], flip=True),
        _strip(ids[6], ids[7]),
        _strip(ids[7], ids[3], flip=True),
    ])
    new_faces = np.concatenate([assets.faces, f_upper, f_lower])

    # Shape dirs: lip-ring average for the shape block, zero for expressions.
    sd = np.concatenate(
        [assets.shapedirs, np.zeros_like(assets.shapedirs[:nvt])], axis=0
    )
    s = assets.n_shape
    sd_mean = (sd[vid_up, :, :s] + sd[vid_lo, :, :s]) / 2
    for r in range(8):
        sd[ids[r], :, :s] = sd_mean

    # Pose dirs / joint regressor: zero for teeth.
    j1 = len(assets.parents) - 1
    pd = assets.posedirs.reshape(j1 * 9, v0, 3)
    pd = np.concatenate([pd, np.zeros((j1 * 9, nvt, 3), np.float32)], axis=1)
    pd = pd.reshape(j1 * 9, (v0 + nvt) * 3)
    jreg = np.concatenate(
        [assets.j_regressor, np.zeros((assets.j_regressor.shape[0], nvt), np.float32)],
        axis=1,
    )
    # Skinning: upper teeth ride the neck joint (1), lower ride the jaw (2).
    w = np.concatenate([assets.lbs_weights, np.zeros((nvt, assets.lbs_weights.shape[1]), np.float32)])
    w[vid_teeth_upper, 1] = 1.0
    w[vid_teeth_lower, 2] = 1.0

    # UVs: a rectangular grid in the reserved teeth patch of the FLAME atlas.
    u = np.linspace(0.62, 0.38, TEETH_ROWS, dtype=np.float32)
    vv = np.linspace(1 - 0.0083, 1 - 0.0425, 7, dtype=np.float32)[
        [3, 2, 0, 1, 3, 4, 6, 5]
    ]
    uv = np.stack(np.meshgrid(u, vv, indexing="ij"), -1).transpose(1, 0, 2).reshape(nvt, 2)
    uvs = np.concatenate([assets.verts_uvs, uv])
    uv0 = assets.verts_uvs.shape[0]
    fuv_upper = f_upper - v0 + uv0
    fuv_lower = f_lower - v0 + uv0
    faces_uv = np.concatenate([assets.faces_uv, fuv_upper, fuv_lower])

    new_masks = dict(masks)
    new_masks["teeth_upper"] = vid_teeth_upper
    new_masks["teeth_lower"] = vid_teeth_lower
    new_masks["teeth"] = np.concatenate([vid_teeth_upper, vid_teeth_lower])

    out = assets._replace(
        v_template=np.concatenate([vt, v_teeth]),
        shapedirs=sd,
        posedirs=pd,
        j_regressor=jreg,
        lbs_weights=w,
        faces=new_faces,
        verts_uvs=uvs,
        faces_uv=faces_uv,
        vertex_masks=new_masks,
    )
    return out, new_masks


def _uniform_laplacian(faces: np.ndarray, num_verts: int) -> "np.ndarray":
    """Dense uniform graph laplacian L = I - D⁻¹A (float32 [V, V] is too big;
    we return CSR-like edge lists instead)."""
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.concatenate([edges, edges[:, ::-1]])
    edges = np.unique(edges, axis=0)
    deg = np.bincount(edges[:, 0], minlength=num_verts).astype(np.float32)
    return edges.astype(np.int32), deg


class FlameModel:
    """Host-side FLAME model: static arrays + pure forward.

    Usage:
        model = FlameModel(assets, FlameConfig())
        verts, verts_cano = model.forward(params)           # jit-friendly
    """

    def __init__(self, assets: FlameAssets, cfg: FlameConfig = FlameConfig()):
        self.cfg = cfg
        if cfg.add_teeth:
            assets, masks = _build_teeth(assets)
        self.assets = assets
        self.faces = jnp.asarray(assets.faces)
        self.num_verts = assets.num_verts
        self.num_faces = assets.num_faces
        self.num_timesteps = 0
        lap_edges, lap_deg = _uniform_laplacian(assets.faces, assets.num_verts)
        self._lap_edges = jnp.asarray(lap_edges)
        self._lap_deg = jnp.asarray(np.maximum(lap_deg, 1.0))
        # Device copies of the statistical arrays (donated into jit as a pytree).
        self.d = {
            "v_template": jnp.asarray(assets.v_template),
            "shapedirs": jnp.asarray(assets.shapedirs),
            "posedirs": jnp.asarray(assets.posedirs),
            "j_regressor": jnp.asarray(assets.j_regressor),
            "lbs_weights": jnp.asarray(assets.lbs_weights),
        }

    # -- regions ------------------------------------------------------------
    def vid_by_region(self, regions: list[str]) -> np.ndarray:
        out = [self.assets.vertex_masks[r] for r in regions if r in self.assets.vertex_masks]
        if not out:
            return np.zeros((0,), np.int32)
        vids = np.unique(np.concatenate(out))
        # Region tables are FLAME-5023 topology data; synthetic debug
        # topologies have fewer vertices — clip instead of crashing.
        return vids[vids < self.num_verts]

    def fid_by_region(self, regions: list[str], min_verts: int = 3) -> np.ndarray:
        """Faces with ≥ `min_verts` vertices inside the union of regions
        (reference voting rule, `flame_model/flame.py:822-838`)."""
        vids = self.vid_by_region(regions)
        inside = np.zeros((self.num_verts,), bool)
        inside[vids] = True
        votes = inside[np.asarray(self.assets.faces)].sum(axis=1)
        return np.nonzero(votes >= min_verts)[0].astype(np.int32)

    def fid_except_region(self, regions: list[str]) -> np.ndarray:
        sel = self.fid_by_region(regions, min_verts=1)
        mask = np.ones((self.num_faces,), bool)
        mask[sel] = False
        return np.nonzero(mask)[0].astype(np.int32)

    # -- forward ------------------------------------------------------------
    def forward(
        self,
        params: FlameParams,
        return_verts_cano: bool = False,
        return_landmarks: bool = False,
        zero_centered_at_root_node: bool = False,
    ):
        """FLAME forward for B timesteps → verts [B, V, 3].

        Mirrors `FlameHead.forward` (`flame_model/flame.py:485-558`).
        """
        d = self.d
        B = params.expr.shape[0]
        shape = jnp.broadcast_to(params.shape[None, :], (B, params.shape.shape[0]))
        betas = jnp.concatenate([shape, params.expr], axis=1)
        v_shaped = d["v_template"][None] + blend_shapes(betas, d["shapedirs"])
        if params.static_offset is not None:
            v_shaped = v_shaped + params.static_offset[None]
        if params.dynamic_offset is not None:
            v_shaped = v_shaped + params.dynamic_offset

        full_pose = jnp.concatenate(
            [params.rotation, params.neck, params.jaw, params.eyes], axis=1
        )
        verts, joints = lbs(
            full_pose, v_shaped, d["posedirs"], d["j_regressor"],
            self.assets.parents, d["lbs_weights"],
        )
        if zero_centered_at_root_node:
            verts = verts - joints[:, :1]
        verts = verts + params.translation[:, None, :]

        out = [verts]
        if return_verts_cano:
            out.append(v_shaped)
        if return_landmarks:
            out.append(
                vertices2landmarks(
                    verts, self.faces,
                    jnp.asarray(self.assets.lmk_faces_idx),
                    jnp.asarray(self.assets.lmk_bary_coords),
                )
            )
        return out[0] if len(out) == 1 else tuple(out)

    # -- regularisers -------------------------------------------------------
    def laplacian_loss(self, verts: jnp.ndarray, verts_ref: jnp.ndarray) -> jnp.ndarray:
        """‖L(verts) − L(verts_ref)‖² with a uniform graph laplacian
        (`compute_laplacian_loss`, `scene/flame_gaussian_model.py:160-171`)."""

        def lap(v):
            # v: [B, V, 3]; neighbour mean via segment-sum over edges.
            src, dst = self._lap_edges[:, 0], self._lap_edges[:, 1]
            nb = jnp.zeros_like(v).at[:, src].add(v[:, dst])
            return v - nb / self._lap_deg[None, :, None]

        return jnp.mean((lap(verts) - lap(verts_ref)) ** 2)
