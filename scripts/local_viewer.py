#!/usr/bin/env python
"""Offline avatar viewer (`local_viewer.py` equivalent).

With DearPyGui installed: interactive window (orbit/pan/zoom, timestep
scrubbing, FLAME joint sliders, splatting/mesh toggles). Headless
(`--headless`): renders the timestep sequence (or a keyframe trajectory
JSON) to PNGs/mp4 — the mode that works on display-less TPU pods.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("point_path", help="trained point_cloud.ply")
    p.add_argument("--flame_assets", default="")
    p.add_argument("--motion_path", default="", help="reenactment flame_param.npz")
    p.add_argument("--width", "-W", type=int, default=802)
    p.add_argument("--height", "-H", type=int, default=550)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--out_dir", default="viewer_frames")
    p.add_argument("--trajectory", default="", help="keyframe JSON (orbit.KeyframeTimeline)")
    p.add_argument("--n_frames", type=int, default=0)
    p.add_argument("--show_mesh", action="store_true")
    p.add_argument("--fps", type=int, default=25)
    return p.parse_args(argv)


def run_headless(a):
    from PIL import Image

    from gaussianavatars_tpu.viewers.local import AvatarViewerCore
    from gaussianavatars_tpu.viewers.orbit import KeyframeTimeline

    core = AvatarViewerCore(
        a.point_path, flame_assets=a.flame_assets, motion_path=a.motion_path,
        width=a.width, height=a.height,
    )
    os.makedirs(a.out_dir, exist_ok=True)
    n = a.n_frames or core.num_timesteps
    timeline = None
    if a.trajectory:
        timeline = KeyframeTimeline()
        timeline.load(a.trajectory)
    for i in range(n):
        cam = core.cam
        if timeline is not None:
            cam = timeline.sample(i / max(n - 1, 1), core.cam)
        img = core.render(
            timestep=i % core.num_timesteps, camera=cam.to_camera(),
            show_mesh=a.show_mesh,
        )
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(a.out_dir, f"{i:05d}.png")
        )
    if shutil.which("ffmpeg") and n > 1:
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(a.fps), "-i",
             os.path.join(a.out_dir, "%05d.png"), "-pix_fmt", "yuv420p",
             os.path.join(a.out_dir, "out.mp4")],
            check=False, capture_output=True,
        )
    print(f"wrote {n} frames to {a.out_dir} ({core.num_points} Gaussians)")


def run_gui(a):
    try:
        import dearpygui.dearpygui as dpg
    except ImportError:
        print("[warn] dearpygui not installed — falling back to --headless")
        return run_headless(a)

    from gaussianavatars_tpu.viewers.local import AvatarViewerCore

    core = AvatarViewerCore(
        a.point_path, flame_assets=a.flame_assets, motion_path=a.motion_path,
        width=a.width, height=a.height,
    )
    state = {"timestep": 0, "show_mesh": a.show_mesh, "dirty": True}

    dpg.create_context()
    with dpg.texture_registry():
        tex = dpg.add_raw_texture(
            a.width, a.height, np.zeros((a.height, a.width, 3), np.float32),
            format=dpg.mvFormat_Float_rgb,
        )
    with dpg.window(tag="main", no_title_bar=True):
        dpg.add_image(tex)
        dpg.add_slider_int(
            label="timestep", max_value=core.num_timesteps - 1,
            callback=lambda s, v: (state.update(timestep=v, dirty=True)),
        )
        dpg.add_checkbox(
            label="show mesh", default_value=a.show_mesh,
            callback=lambda s, v: state.update(show_mesh=v, dirty=True),
        )
        for name, dim in (("jaw", 3), ("neck", 3), ("expr", 10)):
            def mk(name=name, dim=dim):
                def cb(sender, value, user):
                    vec = np.zeros(
                        core.model.cfg.n_expr if name == "expr" else dim, np.float32
                    )
                    vec[user] = value
                    core.overrides.setdefault(name, vec)[user] = value
                    state["dirty"] = True
                return cb
            for d in range(min(dim, 3)):
                dpg.add_slider_float(
                    label=f"{name}[{d}]", min_value=-0.5, max_value=0.5,
                    callback=mk(), user_data=d,
                )

    def on_drag(sender, app_data):
        core.cam.orbit(app_data[1], app_data[2])
        state["dirty"] = True

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left, callback=on_drag)
        dpg.add_mouse_wheel_handler(
            callback=lambda s, v: (core.cam.scale(v), state.update(dirty=True))
        )

    dpg.create_viewport(title="GaussianAvatars-TPU", width=a.width + 40,
                        height=a.height + 220)
    dpg.setup_dearpygui()
    dpg.show_viewport()
    dpg.set_primary_window("main", True)
    while dpg.is_dearpygui_running():
        if state["dirty"]:
            img = core.render(timestep=state["timestep"], show_mesh=state["show_mesh"])
            dpg.set_value(tex, img.astype(np.float32))
            state["dirty"] = False
        dpg.render_dearpygui_frame()
    dpg.destroy_context()


def main(argv=None):
    a = parse_args(argv)
    if a.headless:
        run_headless(a)
    else:
        run_gui(a)


if __name__ == "__main__":
    main()
