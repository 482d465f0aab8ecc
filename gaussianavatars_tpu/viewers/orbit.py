"""Orbit/trackball camera + keyframe timeline for the interactive viewers.

Host-side equivalent of `utils/viewer_utils.py:73-403` (OrbitCamera) and the
keyframe camera path with cubic interpolation in `local_viewer.py:122-288`.
Pure numpy/scipy; produces this framework's `Camera` pytrees.
"""
from __future__ import annotations

import json
import math
from typing import List, Optional

import numpy as np


def _rotmat_from_axis_angle(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = axis / (np.linalg.norm(axis) + 1e-12)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + math.sin(angle) * K + (1 - math.cos(angle)) * (K @ K)


class OrbitCamera:
    """Trackball orbit camera (OpenCV convention: x right, y down, z forward)."""

    def __init__(
        self,
        width: int = 802,
        height: int = 550,
        radius: float = 1.0,
        fovy: float = 0.6981,  # 40°, the demo default
        center=(0.0, 0.0, 0.0),
        convention: str = "opencv",
    ):
        self.width = width
        self.height = height
        self.radius = radius
        self.fovy = fovy
        self.center = np.asarray(center, np.float64)
        # Camera-to-world rotation; identity looks down +z (opencv).
        self.rot = np.eye(3)
        self.convention = convention

    # -- interaction --------------------------------------------------------
    def orbit(self, dx: float, dy: float, sensitivity: float = 0.004) -> None:
        up = self.rot[:, 1]
        right = self.rot[:, 0]
        self.rot = _rotmat_from_axis_angle(up, -dx * sensitivity) @ self.rot
        self.rot = _rotmat_from_axis_angle(right, -dy * sensitivity) @ self.rot

    def pan(self, dx: float, dy: float, sensitivity: float = 0.001) -> None:
        self.center -= sensitivity * self.radius * (
            self.rot[:, 0] * dx + self.rot[:, 1] * dy
        )

    def scale(self, delta: float) -> None:
        self.radius *= 1.1 ** (-delta)

    # -- export -------------------------------------------------------------
    @property
    def position(self) -> np.ndarray:
        return self.center - self.rot[:, 2] * self.radius

    @property
    def pose(self) -> np.ndarray:
        """Camera-to-world 4×4."""
        m = np.eye(4)
        m[:3, :3] = self.rot
        m[:3, 3] = self.position
        return m

    def to_camera(self, znear: float = 0.01, zfar: float = 100.0):
        from ..data.cameras import make_camera

        w2c = np.linalg.inv(self.pose)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]
        aspect = self.width / self.height
        fovx = 2 * math.atan(math.tan(self.fovy / 2) * aspect)
        return make_camera(R, T, fovx, self.fovy, self.width, self.height,
                           znear=znear, zfar=zfar)

    def state_dict(self) -> dict:
        return {
            "rot": self.rot.tolist(), "center": self.center.tolist(),
            "radius": self.radius, "fovy": self.fovy,
            "width": self.width, "height": self.height,
        }

    def load_state_dict(self, d: dict) -> None:
        self.rot = np.asarray(d["rot"])
        self.center = np.asarray(d["center"])
        self.radius = float(d["radius"])
        self.fovy = float(d["fovy"])
        self.width = int(d.get("width", self.width))
        self.height = int(d.get("height", self.height))


class KeyframeTimeline:
    """Keyframed camera trajectory with cubic interpolation
    (`local_viewer.py:122-288`)."""

    def __init__(self):
        self.keyframes: List[dict] = []  # {"time": t, "rot": R, "center": c, "radius": r}

    def add(self, time: float, cam: OrbitCamera) -> None:
        self.keyframes.append({
            "time": float(time), "rot": cam.rot.copy(),
            "center": cam.center.copy(), "radius": cam.radius,
        })
        self.keyframes.sort(key=lambda k: k["time"])

    def sample(self, time: float, template: OrbitCamera) -> OrbitCamera:
        """Interpolated camera at `time` (slerp-free: cubic on look-at params)."""
        import copy

        kfs = self.keyframes
        cam = copy.deepcopy(template)
        if not kfs:
            return cam
        if len(kfs) == 1 or time <= kfs[0]["time"]:
            k = kfs[0]
        elif time >= kfs[-1]["time"]:
            k = kfs[-1]
        else:
            times = np.array([k["time"] for k in kfs])
            if len(kfs) >= 4:
                from scipy.interpolate import CubicSpline
                from scipy.spatial.transform import Rotation, Slerp

                centers = np.stack([k["center"] for k in kfs])
                radii = np.array([k["radius"] for k in kfs])
                cs_c = CubicSpline(times, centers)
                cs_r = CubicSpline(times, radii)
                slerp = Slerp(times, Rotation.from_matrix(
                    np.stack([k["rot"] for k in kfs])
                ))
                cam.center = cs_c(time)
                cam.radius = float(cs_r(time))
                cam.rot = slerp(time).as_matrix()
                return cam
            # linear fallback for < 4 keys
            i = int(np.searchsorted(times, time)) - 1
            a, b = kfs[i], kfs[i + 1]
            u = (time - a["time"]) / (b["time"] - a["time"] + 1e-12)
            from scipy.spatial.transform import Rotation, Slerp

            slerp = Slerp([0, 1], Rotation.from_matrix(np.stack([a["rot"], b["rot"]])))
            cam.center = (1 - u) * a["center"] + u * b["center"]
            cam.radius = float((1 - u) * a["radius"] + u * b["radius"])
            cam.rot = slerp(u).as_matrix()
            return cam
        cam.center = k["center"].copy()
        cam.radius = k["radius"]
        cam.rot = k["rot"].copy()
        return cam

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump([
                {"time": k["time"], "rot": k["rot"].tolist(),
                 "center": k["center"].tolist(), "radius": k["radius"]}
                for k in self.keyframes
            ], f)

    def load(self, path: str) -> None:
        with open(path) as f:
            raw = json.load(f)
        self.keyframes = [
            {"time": k["time"], "rot": np.asarray(k["rot"]),
             "center": np.asarray(k["center"]), "radius": k["radius"]}
            for k in raw
        ]
