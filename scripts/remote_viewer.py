#!/usr/bin/env python
"""Training monitor client (`remote_viewer.py` equivalent).

Connects to a running `scripts/train.py --port N`, streams rendered frames
over the reference wire protocol, and shows them interactively (DearPyGui)
or dumps them to disk (`--headless`, for display-less pods).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=60000)
    p.add_argument("--width", "-W", type=int, default=802)
    p.add_argument("--height", "-H", type=int, default=550)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--n_frames", type=int, default=10)
    p.add_argument("--out_dir", default="remote_frames")
    p.add_argument("--pause_training", action="store_true")
    p.add_argument("--show_mesh", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    from gaussianavatars_tpu.viewers.network_gui import RemoteClient
    from gaussianavatars_tpu.viewers.orbit import OrbitCamera

    cam = OrbitCamera(width=a.width, height=a.height, radius=1.0)
    client = RemoteClient(a.host, a.port)

    if a.headless:
        from PIL import Image

        os.makedirs(a.out_dir, exist_ok=True)
        for i in range(a.n_frames):
            img, stats = client.request(
                camera=cam.to_camera(), timestep=i,
                do_training=not a.pause_training, keep_alive=True,
                show_mesh=a.show_mesh,
            )
            if img is not None:
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    os.path.join(a.out_dir, f"{i:05d}.png")
                )
            print(f"frame {i}: {stats}")
            time.sleep(0.1)
        client.close()
        return

    try:
        import dearpygui.dearpygui as dpg
    except ImportError:
        print("[warn] dearpygui not installed — use --headless")
        return

    dpg.create_context()
    with dpg.texture_registry():
        tex = dpg.add_raw_texture(
            a.width, a.height, np.zeros((a.height, a.width, 3), np.float32),
            format=dpg.mvFormat_Float_rgb,
        )
    state = {"training": True, "timestep": 0}
    with dpg.window(tag="main", no_title_bar=True):
        dpg.add_image(tex)
        dpg.add_text("", tag="stats")
        dpg.add_checkbox(label="train", default_value=True,
                         callback=lambda s, v: state.update(training=v))
        dpg.add_slider_int(label="timestep", max_value=500,
                           callback=lambda s, v: state.update(timestep=v))

    def on_drag(sender, app_data):
        cam.orbit(app_data[1], app_data[2])

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left, callback=on_drag)
        dpg.add_mouse_wheel_handler(callback=lambda s, v: cam.scale(v))

    dpg.create_viewport(title="remote viewer", width=a.width + 40, height=a.height + 140)
    dpg.setup_dearpygui()
    dpg.show_viewport()
    dpg.set_primary_window("main", True)
    while dpg.is_dearpygui_running():
        try:
            img, stats = client.request(
                camera=cam.to_camera(), timestep=state["timestep"],
                do_training=state["training"], keep_alive=True,
                show_mesh=a.show_mesh,
            )
            if img is not None:
                dpg.set_value(tex, img.astype(np.float32))
            dpg.set_value("stats", str(stats))
        except Exception as e:
            dpg.set_value("stats", f"disconnected: {e}")
            time.sleep(0.5)
        dpg.render_dearpygui_frame()
    dpg.destroy_context()


if __name__ == "__main__":
    main()
