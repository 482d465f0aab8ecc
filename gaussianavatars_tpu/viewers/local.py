"""Offline avatar viewer core (UI-agnostic).

The logic of `local_viewer.py:97-678` — load a trained PLY (+flame_param
sidecar), scrub timesteps, drive FLAME joints/expressions live, render
splatting and/or mesh overlay — factored out of the GUI so it runs headless
(frame export, tests) or under DearPyGui when available
(`scripts/local_viewer.py`).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..models.io import load_avatar
from .orbit import OrbitCamera


class AvatarViewerCore:
    def __init__(
        self,
        ply_path: str,
        flame_assets: str = "",
        motion_path: str = "",
        width: int = 802,
        height: int = 550,
        use_pallas: Optional[bool] = None,
        tile: Optional[dict] = None,
    ):
        import jax
        import jax.numpy as jnp

        from ..models.flame import FlameConfig, FlameModel
        from ..models.flame.assets import load_assets
        from ..ops.rasterize_tiled import TileConfig

        self.params, self.aux, self.flame_table = load_avatar(
            ply_path, motion_path=motion_path
        )
        self.model = None
        self.num_timesteps = 1
        if self.flame_table is not None:
            # Prefer the model dir's saved topology (two levels up from the PLY).
            model_dir = os.path.dirname(os.path.dirname(os.path.dirname(ply_path)))
            cand = [flame_assets, os.path.join(model_dir, "flame_assets.npz")]
            path = next((c for c in cand if c and os.path.exists(c)), None)
            if path is None:
                raise FileNotFoundError(
                    "bound avatar needs FLAME assets (flame_assets.npz beside the "
                    "model or --flame_assets)"
                )
            assets = load_assets(path)
            self.model = FlameModel(assets, FlameConfig(
                n_shape=assets.n_shape,
                n_expr=assets.shapedirs.shape[-1] - assets.n_shape,
                add_teeth=False,
            ))
            self.num_timesteps = self.flame_table["expr"].shape[0]
        center, extent = self._bounds()
        self.cam = OrbitCamera(width=width, height=height,
                               radius=3.5 * extent, center=center)
        self.tile = TileConfig(**(tile or {}))
        self.use_pallas = (
            use_pallas if use_pallas is not None else jax.default_backend() == "tpu"
        )
        self.overrides: Dict[str, np.ndarray] = {}  # live slider values
        # Reference "enable control" semantics (`local_viewer.py:534-611`):
        # when on, ALL driven params come from `control` (zeros + slider
        # deltas) instead of the timestep table.
        self.control_enabled = False
        self.control: Dict[str, np.ndarray] = {}
        self.reset_flame()
        self._jit_cache = {}

    def reset_flame(self) -> None:
        """`reset_flame_param` (`local_viewer.py:291-299`)."""
        n_expr = self.model.cfg.n_expr if self.model is not None else 0
        self.control = {
            "expr": np.zeros(n_expr, np.float32),
            "rotation": np.zeros(3, np.float32),
            "neck": np.zeros(3, np.float32),
            "jaw": np.zeros(3, np.float32),
            "eyes": np.zeros(6, np.float32),
            "translation": np.zeros(3, np.float32),
        }

    def set_pose(self, joint: str, axis: int, value: float) -> None:
        """Joint slider (`callback_set_pose`, `local_viewer.py:536-547`);
        the eyes slider drives both eyes' matching axis."""
        self.control[joint][axis] = value
        if joint == "eyes":
            self.control[joint][3 + axis] = value
        self.control_enabled = True

    def set_expr(self, i: int, value: float) -> None:
        self.control["expr"][i] = value
        self.control_enabled = True

    def _bounds(self):
        if self.model is not None:
            v = np.asarray(self.model.assets.v_template)
        else:
            alive = np.asarray(self.aux.alive)
            v = np.asarray(self.params.means)[alive]
        center = v.mean(0)
        extent = float(np.abs(v - center).max()) or 1.0
        return center, extent

    def flame_params_at(self, timestep: int):
        """FLAME inputs for one timestep, with live overrides applied
        (`update_mesh_by_param_dict`, `scene/flame_gaussian_model.py:90-114`)."""
        import jax.numpy as jnp

        from ..models.flame.flame_model import FlameParams

        t = int(np.clip(timestep, 0, self.num_timesteps - 1))
        tab = self.flame_table

        def get(name, wire):
            if self.control_enabled:
                return jnp.asarray(self.control[name])[None]
            if name in self.overrides:
                return jnp.asarray(self.overrides[name])[None]
            return jnp.asarray(tab[wire][t])[None]

        n_verts = self.model.num_verts
        so = np.asarray(tab.get("static_offset", np.zeros((n_verts, 3)))).reshape(-1, 3)
        if so.shape[0] != n_verts:
            so = np.pad(so, ((0, max(0, n_verts - so.shape[0])), (0, 0)))[:n_verts]
        return FlameParams(
            shape=jnp.asarray(tab["shape"])[: self.model.cfg.n_shape],
            expr=get("expr", "expr")[:, : self.model.cfg.n_expr],
            rotation=get("rotation", "rotation"),
            neck=get("neck", "neck_pose"),
            jaw=get("jaw", "jaw_pose"),
            eyes=get("eyes", "eyes_pose"),
            translation=get("translation", "translation"),
            static_offset=jnp.asarray(so),
        )

    def render(
        self,
        timestep: int = 0,
        camera=None,
        show_splatting: bool = True,
        show_mesh: bool = False,
        mesh_opacity: float = 0.5,
        scaling_modifier: float = 1.0,
        sh_degree: int = 3,
        bg=(0.0, 0.0, 0.0),
    ) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from ..models.binding import face_frames
        from ..models.gaussians import world_gaussians
        from ..ops.mesh_raster import render_mesh_preview
        from ..ops.rasterize_tiled import render_tiled

        cam = camera if camera is not None else self.cam.to_camera()
        bg = jnp.asarray(bg, jnp.float32)
        verts = None
        if self.model is not None:
            fp = self.flame_params_at(timestep)
            verts = self.model.forward(fp)[0]
            frames = face_frames(verts, self.model.faces)
        else:
            frames = None

        image = None
        if show_splatting:
            wg = world_gaussians(self.params, self.aux, frames)
            out = render_tiled(
                wg.means, wg.scales, wg.quats, wg.opacity, cam, bg,
                sh=wg.sh, sh_degree=sh_degree, alive=wg.alive,
                scale_modifier=scaling_modifier, cfg=self.tile,
                use_pallas=self.use_pallas,
            )
            image = np.asarray(jnp.clip(out.color, 0, 1))
        if show_mesh and verts is not None:
            out = render_mesh_preview(verts, self.model.faces, cam, background=bg)
            rgb = np.asarray(out["rgba"][..., :3])
            alpha = np.asarray(out["rgba"][..., 3:])
            if image is None:
                image = rgb
            else:
                image = rgb * alpha * mesh_opacity + image * (
                    alpha * (1 - mesh_opacity) + (1 - alpha)
                )
        if image is None:
            image = np.zeros((cam.height, cam.width, 3), np.float32)
        return image

    @property
    def num_points(self) -> int:
        return int(np.asarray(self.aux.alive).sum())
