"""Viewer subsystem: wire protocol, orbit camera, headless viewer core."""
import json
import os
import sys
import threading

import numpy as np
import pytest

from fixtures_avatar import (
    N_EXPR, N_SHAPE, make_flame_model, reference_avatar, write_rendered_dataset,
)
from gaussianavatars_tpu.viewers.network_gui import (
    GuiServer, RemoteClient, _camera_from_msg, read_message, send_message,
)
from gaussianavatars_tpu.viewers.orbit import KeyframeTimeline, OrbitCamera

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_orbit_camera_geometry():
    cam = OrbitCamera(width=64, height=48, radius=2.0, center=(1.0, 0.0, 0.0))
    pos0 = cam.position.copy()
    np.testing.assert_allclose(pos0, [1.0, 0.0, -2.0], atol=1e-9)
    cam.orbit(100.0, 0.0)
    assert np.linalg.norm(cam.position - pos0) > 1e-3
    np.testing.assert_allclose(np.linalg.norm(cam.position - cam.center), 2.0)
    cam.scale(1.0)
    assert cam.radius < 2.0
    c = cam.to_camera()
    # Camera looks at the orbit centre: centre projects near the image middle.
    ch = np.asarray(c.full_proj) @ np.array([*cam.center, 1.0])
    ndc = ch[:2] / ch[3]
    np.testing.assert_allclose(ndc, 0.0, atol=1e-6)


def test_orbit_state_roundtrip():
    cam = OrbitCamera()
    cam.orbit(30, -20)
    cam.pan(5, 3)
    d = cam.state_dict()
    cam2 = OrbitCamera()
    cam2.load_state_dict(json.loads(json.dumps(d)))
    np.testing.assert_allclose(cam2.pose, cam.pose)


def test_keyframe_timeline(tmp_path):
    tl = KeyframeTimeline()
    base = OrbitCamera()
    for t in (0.0, 0.3, 0.6, 1.0):
        c = OrbitCamera(radius=1.0 + t)
        c.orbit(200 * t, 0)
        tl.add(t, c)
    mid = tl.sample(0.45, base)
    assert 1.0 < mid.radius < 2.0
    np.testing.assert_allclose(mid.rot @ mid.rot.T, np.eye(3), atol=1e-8)
    tl.save(str(tmp_path / "traj.json"))
    tl2 = KeyframeTimeline()
    tl2.load(str(tmp_path / "traj.json"))
    np.testing.assert_allclose(
        tl2.sample(0.45, base).pose, mid.pose, atol=1e-9
    )


def test_camera_wire_roundtrip():
    """Camera → client wire encoding → server decode ≈ identity."""
    src = OrbitCamera(width=32, height=24, radius=2.5, center=(0.1, -0.2, 0.3))
    src.orbit(50, 30)
    cam = src.to_camera()
    wv = np.asarray(cam.world_view).T.copy()
    wv[:, 1] = -wv[:, 1]
    wv[:, 2] = -wv[:, 2]
    fp = np.asarray(cam.full_proj).T.copy()
    fp[:, 1] = -fp[:, 1]
    msg = {
        "resolution_x": 32, "resolution_y": 24,
        "view_matrix": wv.reshape(-1).tolist(),
        "view_projection_matrix": fp.reshape(-1).tolist(),
        "fov_y": cam.fovy, "fov_x": cam.fovx, "z_near": 0.01, "z_far": 100.0,
        "timestep": 3,
    }
    dec = _camera_from_msg(msg)
    np.testing.assert_allclose(np.asarray(dec.world_view), np.asarray(cam.world_view), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dec.full_proj), np.asarray(cam.full_proj), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec.camera_center), np.asarray(cam.camera_center), atol=1e-5)
    assert dec.timestep == 3 and dec.width == 32


@pytest.fixture(scope="module")
def avatar_ply(tmp_path_factory):
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame.assets import save_assets

    model = make_flame_model(tmp_path_factory.mktemp("mesh"))
    root = str(tmp_path_factory.mktemp("ds"))
    params, aux = reference_avatar(model)
    write_rendered_dataset(root, model, params, aux)
    model_path = str(tmp_path_factory.mktemp("model"))
    save_assets(model.assets, os.path.join(model_path, "flame_assets.npz"))
    scene = Scene(root, model_path=model_path, num_verts_hint=model.num_verts)
    ply = scene.save(5, params, aux, flame_param=scene.flame_table)
    return ply


def test_viewer_core_headless(avatar_ply):
    from gaussianavatars_tpu.viewers.local import AvatarViewerCore

    core = AvatarViewerCore(
        avatar_ply, width=64, height=48, use_pallas=False,
        tile=dict(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16),
    )
    assert core.num_timesteps == 2 and core.num_points == 352
    img = core.render(timestep=0)
    assert img.shape == (48, 64, 3) and img.max() > 0.05
    img_mesh = core.render(timestep=0, show_splatting=False, show_mesh=True)
    assert img_mesh.max() > 0.05
    # Live jaw override changes the image
    core.overrides["jaw"] = np.array([0.4, 0.0, 0.0], np.float32)
    img2 = core.render(timestep=0)
    assert np.abs(img2 - img).mean() > 1e-4


def test_local_viewer_cli_headless(avatar_ply, tmp_path):
    import importlib

    lv = importlib.import_module("local_viewer")
    out = str(tmp_path / "frames")
    lv.main([avatar_ply, "--headless", "--out_dir", out, "-W", "64", "-H", "48",
             "--n_frames", "2"])
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 2


def test_protocol_server_client(avatar_ply):
    """Full wire roundtrip against a live render server."""
    from gaussianavatars_tpu.viewers.local import AvatarViewerCore

    core = AvatarViewerCore(
        avatar_ply, width=32, height=24, use_pallas=False,
        tile=dict(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16),
    )
    server = GuiServer("127.0.0.1", 0)

    def serve():
        while not server.try_connect():
            pass
        for _ in range(2):
            cam, msg = server.receive()
            img = core.render(timestep=msg.get("timestep", 0), camera=cam)
            server.send(img, {"num_timesteps": core.num_timesteps,
                              "num_points": core.num_points})
        server.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    client = RemoteClient("127.0.0.1", server.port)
    orbit = OrbitCamera(width=32, height=24, radius=float(core.cam.radius),
                        center=tuple(core.cam.center))
    img, stats = client.request(camera=orbit.to_camera(), timestep=0)
    assert img.shape == (24, 32, 3)
    assert stats == {"num_timesteps": 2, "num_points": 352}
    img2, _ = client.request(camera=orbit.to_camera(), timestep=1)
    assert np.abs(img2 - img).sum() > 0  # jaw moved between timesteps
    client.close()
    th.join(timeout=10)
    assert not th.is_alive()


def test_keyframe_editor_semantics(tmp_path):
    """Interval-based editor parity (`local_viewer.py:122-167,432-520`):
    insert-after, timeline length with/without cycles, interpolation hits
    keyframes, save/load roundtrip."""
    from gaussianavatars_tpu.viewers.orbit import KeyframeEditor

    ed = KeyframeEditor(fps=10, keyframe_interval=1.0)
    cams = []
    for t in range(4):
        c = OrbitCamera(radius=1.0 + t)
        c.orbit(150 * t, 40 * t)
        cams.append(c)
        ed.add(c)
    assert [k["interval"] for k in ed.keyframes] == [10, 10, 10, 10]
    # cycles==0 → last keyframe's interval excluded (reference :124-126)
    assert ed.timeline_length() == 30
    ed.cycles = 2
    assert ed.timeline_length() == 80
    ed.cycles = 0
    # Record frame 10 = exactly keyframe 1 (cubic interp passes through keys).
    st = ed.state_at(ed.start_frame_of(1))
    probe = OrbitCamera()
    ed.apply_state(probe, st)
    np.testing.assert_allclose(probe.radius, cams[1].radius, atol=1e-6)
    np.testing.assert_allclose(probe.pose, cams[1].pose, atol=1e-6)
    # insert-after + delete keep ordering
    ed.add(cams[0], after=0)
    assert len(ed.keyframes) == 5 and ed.start_frame_of(2) == 20
    ed.delete(1)
    assert ed.timeline_length() == 30
    # interval edit rescales every key
    ed.set_interval(0.5)
    assert ed.timeline_length() == 15
    p = str(tmp_path / "kf.json")
    ed.save(p)
    ed2 = KeyframeEditor()
    ed2.load(p)
    assert ed2.timeline_length() == 15
    st2 = ed2.state_at(7)
    for ch in ("rot", "look_at", "radius", "fovy"):
        np.testing.assert_allclose(st2[ch], ed.state_at(7)[ch], atol=1e-12)


def test_flame_control_panel_semantics(avatar_ply):
    """enable-control switches ALL driven params to the control dict; eyes
    slider mirrors both eyes; reset zeroes (`local_viewer.py:291-299,534-611`)."""
    from gaussianavatars_tpu.viewers.local import AvatarViewerCore

    core = AvatarViewerCore(
        avatar_ply, width=64, height=48, use_pallas=False,
        tile=dict(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16),
    )
    # Timestep 1's table has a nonzero jaw; enabling control zeroes it.
    tab_img = core.render(timestep=1)
    core.control_enabled = True
    ctrl_img = core.render(timestep=1)
    assert np.abs(ctrl_img - tab_img).mean() > 1e-5
    core.set_pose("eyes", 1, 0.3)
    np.testing.assert_allclose(core.control["eyes"], [0, 0.3, 0, 0, 0.3, 0])
    core.set_pose("jaw", 0, 0.35)
    jaw_img = core.render(timestep=1)
    assert np.abs(jaw_img - ctrl_img).mean() > 1e-5
    core.reset_flame()
    np.testing.assert_allclose(core.render(timestep=1), ctrl_img, atol=1e-7)


def test_export_trajectory(avatar_ply, tmp_path):
    """Record-timeline export writes frames + a re-renderable trajectory.json
    (`export_trajectory`, `local_viewer.py:208-288`)."""
    from gaussianavatars_tpu.viewers.local import AvatarViewerCore
    from gaussianavatars_tpu.viewers.orbit import KeyframeEditor, export_trajectory

    core = AvatarViewerCore(
        avatar_ply, width=64, height=48, use_pallas=False,
        tile=dict(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16),
    )
    ed = KeyframeEditor(fps=2, keyframe_interval=1.0)
    for ang in (0.0, 120.0, 240.0):
        core.cam.orbit(ang, 0)
        ed.add(core.cam)
    out = str(tmp_path / "traj")
    traj = export_trajectory(ed, core, out, dynamic=True)
    n = ed.timeline_length()
    assert len(traj["frames"]) == n == 4
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == n
    fr = traj["frames"][0]
    for k in ("cx", "cy", "fl_x", "fl_y", "h", "w", "camera_angle_x",
              "transform_matrix", "timestep_index", "file_path"):
        assert k in fr, k
    # dynamic=True advanced the timestep
    assert traj["frames"][1]["timestep_index"] == 1
    assert traj["timestep_indices"] == [0, 1]
    with open(os.path.join(out, "trajectory.json")) as f:
        assert json.load(f)["frames"][0]["h"] == 48
