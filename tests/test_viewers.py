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
