"""Camera pytree.

Replaces the reference's `Camera(nn.Module)` / `MiniCam` (`scene/cameras.py`)
with a single frozen dataclass pytree: all matrix fields are jnp arrays (so a
Camera can flow through jit/shard_map); sizes are static Python ints (XLA
needs static image shapes).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transforms import projection_matrix, world_to_view


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single view. Column-vector convention: p_view = world_view @ [p;1]."""

    world_view: jnp.ndarray  # [4,4] world→camera
    proj: jnp.ndarray        # [4,4] camera→clip
    full_proj: jnp.ndarray   # [4,4] world→clip (= proj @ world_view)
    camera_center: jnp.ndarray  # [3] camera position in world
    # Static metadata (not traced):
    fovx: float = dataclasses.field(metadata=dict(static=True))
    fovy: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    timestep: int = dataclasses.field(default=0, metadata=dict(static=True))
    camera_id: int = dataclasses.field(default=0, metadata=dict(static=True))
    image_name: str = dataclasses.field(default="", metadata=dict(static=True))

    @property
    def tan_half_fovx(self) -> float:
        return math.tan(self.fovx / 2)

    @property
    def tan_half_fovy(self) -> float:
        return math.tan(self.fovy / 2)

    @property
    def focal_x(self) -> float:
        return self.width / (2 * self.tan_half_fovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2 * self.tan_half_fovy)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    translate=(0.0, 0.0, 0.0),
    scale: float = 1.0,
    timestep: int = 0,
    camera_id: int = 0,
    image_name: str = "",
) -> Camera:
    """Build a Camera from COLMAP-convention extrinsics (R, T) and FoVs."""
    w2v = world_to_view(R, T, translate, scale)
    proj = projection_matrix(znear, zfar, fovx, fovy)
    full = proj @ w2v
    # camera centre = translation of inv(world_view)
    cam_center = -w2v[:3, :3].T @ w2v[:3, 3]
    return Camera(
        world_view=w2v,
        proj=proj,
        full_proj=full,
        camera_center=cam_center,
        fovx=float(fovx),
        fovy=float(fovy),
        width=int(width),
        height=int(height),
        timestep=int(timestep),
        camera_id=int(camera_id),
        image_name=image_name,
    )


def look_at_camera(
    eye,
    target=(0.0, 0.0, 0.0),
    up=(0.0, -1.0, 0.0),
    fovy: float = 0.6,
    width: int = 512,
    height: int = 512,
    **kw,
) -> Camera:
    """Convenience constructor: camera at `eye` looking at `target`.

    `up` defaults to -y because the camera frame is OpenCV-style (y down).
    """
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Camera-to-world rotation columns = (right, down, forward).
    R = np.stack([right, down, fwd], axis=1)
    T = -R.T @ eye
    aspect = width / height
    fovx = 2 * math.atan(math.tan(fovy / 2) * aspect)
    return make_camera(R, T, fovx, fovy, width, height, **kw)


def resolution_scaled(cam: Camera, scale: float) -> Camera:
    """Return the same view at `1/scale` resolution (progressive training)."""
    if scale == 1.0:
        return cam
    return dataclasses.replace(
        cam,
        width=max(1, round(cam.width / scale)),
        height=max(1, round(cam.height / scale)),
    )


def jit_static_key(cam: Camera) -> Camera:
    """Strip per-view metadata (timestep/camera_id/image_name) that would
    otherwise be part of the jit cache key — every distinct view would
    retrace/recompile any jitted function taking the Camera. Use at every
    jit boundary; pass the timestep as a traced argument instead."""
    return dataclasses.replace(cam, timestep=0, camera_id=0, image_name="")
