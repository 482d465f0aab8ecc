"""Dataset layer: COLMAP parsers, transforms readers, Scene, prefetcher."""
import json
import os

import numpy as np
import pytest

from gaussianavatars_tpu.data.colmap import (
    ColmapCamera, ColmapImage, ColmapPoints,
    qvec_to_rotmat, rotmat_to_qvec,
    read_cameras_binary, read_images_binary, read_points3d_binary,
    write_cameras_binary, write_images_binary, write_points3d_binary,
)
from gaussianavatars_tpu.data.pipeline import Prefetcher, decode_image
from gaussianavatars_tpu.data.readers import detect_scene_type, read_dynamic_nerf
from gaussianavatars_tpu.data.scene import (
    Scene, assemble_flame_table, resolve_resolution,
)
from gaussianavatars_tpu.data.ply import load_point_ply, save_point_ply


def _write_png(path, rgb, alpha=None):
    from PIL import Image

    arr = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    if alpha is not None:
        a = (np.clip(alpha, 0, 1) * 255).astype(np.uint8)[..., None]
        arr = np.concatenate([arr, a], -1)
        Image.fromarray(arr, "RGBA").save(path)
    else:
        Image.fromarray(arr, "RGB").save(path)


@pytest.fixture(scope="module")
def avatar_dataset(tmp_path_factory):
    """Tiny DynamicNerf-style dataset: 2 timesteps × 2 cameras per split."""
    root = tmp_path_factory.mktemp("avatar_ds")
    os.makedirs(root / "images")
    os.makedirs(root / "flame_param")
    rng = np.random.default_rng(0)
    W, H = 32, 24

    def frames_for(split, timesteps, cam_ids):
        frames = []
        for t in timesteps:
            npz = root / "flame_param" / f"{split}_{t}.npz"
            np.savez(
                npz,
                shape=rng.normal(size=300).astype(np.float32),
                expr=rng.normal(size=(1, 100)).astype(np.float32) * 0.01,
                rotation=np.zeros((1, 3), np.float32),
                neck_pose=np.zeros((1, 3), np.float32),
                jaw_pose=np.full((1, 3), 0.1, np.float32),
                eyes_pose=np.zeros((1, 6), np.float32),
                translation=np.zeros((1, 3), np.float32),
                static_offset=rng.normal(size=(1, 5023, 3)).astype(np.float32) * 1e-3,
            )
            for c in cam_ids:
                name = f"images/{split}_t{t}_c{c}.png"
                _write_png(
                    str(root / name),
                    rng.random((H, W, 3)),
                    alpha=np.ones((H, W)) * (0.5 if c == 0 else 1.0),
                )
                c2w = np.eye(4)
                c2w[0, 3] = c * 0.5
                c2w[2, 3] = 3.0
                frames.append({
                    "file_path": name,
                    "transform_matrix": c2w.tolist(),
                    "timestep_index": t,
                    "camera_index": c,
                    "flame_param_path": os.path.relpath(npz, root),
                    "w": W, "h": H,
                })
        return frames

    for split, ts in (("train", [0, 1]), ("val", [0]), ("test", [1])):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.6, "frames": frames_for(split, ts, [0, 1])}, f)
    return root


def test_detect_scene_type(avatar_dataset, tmp_path):
    assert detect_scene_type(str(avatar_dataset)) == "dynamic_nerf"
    os.makedirs(tmp_path / "sparse")
    assert detect_scene_type(str(tmp_path)) == "colmap"
    with pytest.raises(ValueError):
        detect_scene_type("/nonexistent-path-xyz")


def test_read_dynamic_nerf(avatar_dataset):
    info = read_dynamic_nerf(str(avatar_dataset))
    assert len(info.train_cameras) == 4 and len(info.val_cameras) == 2
    assert len(info.test_cameras) == 2
    assert set(info.train_meshes) == {0, 1}
    rec = info.train_cameras[0]
    assert rec.width == 32 and rec.height == 24
    assert rec.timestep == 0 and rec.camera_id in (0, 1)
    # camera at z=3 looking along -z (after OpenGL→COLMAP flip): center ≈ (0|0.5, 0, 3)
    w2c = np.eye(4); w2c[:3, :3] = rec.R.T; w2c[:3, 3] = rec.T
    center = np.linalg.inv(w2c)[:3, 3]
    assert abs(center[2] - 3.0) < 1e-6
    assert info.nerf_normalization["radius"] > 0


def test_reenactment_merges_splits(avatar_dataset):
    info = read_dynamic_nerf(str(avatar_dataset), target_path=str(avatar_dataset))
    assert len(info.train_cameras) == 8 and not info.test_cameras
    assert info.tgt_train_meshes and info.tgt_test_meshes


def test_flame_table(avatar_dataset):
    info = read_dynamic_nerf(str(avatar_dataset))
    table = assemble_flame_table(
        info.train_meshes, info.test_meshes, {}, {}, num_verts=5143
    )
    assert table["expr"].shape == (2, 100)
    assert table["static_offset"].shape == (5143, 3)  # padded 5023 → 5143
    assert np.all(table["static_offset"][5023:] == 0)
    assert np.allclose(table["jaw_pose"], 0.1)
    assert table["shape"].shape == (300,)


def test_scene(avatar_dataset, tmp_path):
    model_path = str(tmp_path / "model")
    sc = Scene(
        str(avatar_dataset), model_path=model_path,
        resolution_scales=(1.0, 2.0), num_verts_hint=5143,
    )
    assert sc.kind == "dynamic_nerf"
    assert sc.num_timesteps == 2
    assert len(sc.train_cameras()) == 4
    assert sc.train_cameras(2.0)[0].width == 16
    assert os.path.exists(os.path.join(model_path, "cameras.json"))
    cams = json.load(open(os.path.join(model_path, "cameras.json")))
    assert len(cams) == 8 and "position" in cams[0]


def test_scene_select_camera(avatar_dataset):
    sc = Scene(str(avatar_dataset), select_camera_id=1, num_verts_hint=5143)
    assert len(sc.train_cameras()) == 2
    assert all(r.camera_id == 1 for r in sc.records("train"))


def test_scene_save_roundtrip(avatar_dataset, tmp_path):
    import jax

    from gaussianavatars_tpu.data.ply import load_gaussian_ply
    from gaussianavatars_tpu.models.gaussians import init_bound

    sc = Scene(str(avatar_dataset), model_path=str(tmp_path / "m"), num_verts_hint=5143)
    params, aux = init_bound(16, capacity=32, key=jax.random.PRNGKey(0))
    path = sc.save(100, params, aux, flame_param=sc.flame_table)
    out = load_gaussian_ply(path)
    assert out["means"].shape == (16, 3)
    assert out["binding"] is not None
    side = np.load(os.path.join(os.path.dirname(path), "flame_param.npz"))
    assert side["expr"].shape == (2, 100)


def test_resolution_policy():
    assert resolve_resolution(1600, 1200, -1) == (1600, 1200)
    w, h = resolve_resolution(3200, 2400, -1)
    assert w == 1600 and h == 1200
    assert resolve_resolution(1000, 800, 2) == (500, 400)
    assert resolve_resolution(1000, 800, 500) == (500, 400)
    assert resolve_resolution(1000, 800, 2, resolution_scale=2.0) == (250, 200)


def test_decode_composites_alpha(avatar_dataset):
    info = read_dynamic_nerf(str(avatar_dataset), white_background=True)
    rec = next(r for r in info.train_cameras if r.camera_id == 0)  # alpha 0.5
    img = decode_image(rec.image_path, rec.bg, rec.width, rec.height)
    assert img.shape == (24, 32, 3)
    # white bg at alpha .5: image = .5*rgb + .5 → mean well above raw mean
    assert img.mean() > 0.45


def test_prefetcher(avatar_dataset):
    sc = Scene(str(avatar_dataset), num_verts_hint=5143)
    pf = Prefetcher(
        sc.records("train"), sc.train_cameras(), seed=0, workers=2,
        device_put=False,
    )
    seen = []
    for _ in range(8):  # two epochs of 4
        views, gt = pf.next()
        assert gt.shape == (1, 24, 32, 3)
        seen.extend(views)
    pf.close()
    assert sorted(seen[:4]) == [0, 1, 2, 3]  # first epoch is a permutation
    assert sorted(seen[4:8]) == [0, 1, 2, 3]


def test_colmap_binary_roundtrip(tmp_path):
    cams = {1: ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))}
    q = rotmat_to_qvec(np.eye(3))
    imgs = {
        3: ColmapImage(3, q, np.array([0.1, 0.2, 0.3]), 1, "a.png",
                       np.array([[1.0, 2.0]]), np.array([7], np.int64)),
    }
    pts = ColmapPoints(
        xyz=np.array([[0.0, 1.0, 2.0]]), rgb=np.array([[10, 20, 30]], np.uint8),
        errors=np.array([0.5]),
    )
    write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    write_images_binary(imgs, str(tmp_path / "images.bin"))
    write_points3d_binary(pts, str(tmp_path / "points3D.bin"))
    c2 = read_cameras_binary(str(tmp_path / "cameras.bin"))
    i2 = read_images_binary(str(tmp_path / "images.bin"))
    p2 = read_points3d_binary(str(tmp_path / "points3D.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    assert i2[3].name == "a.png" and i2[3].camera_id == 1
    np.testing.assert_allclose(i2[3].qvec, q)
    np.testing.assert_allclose(i2[3].xys, [[1.0, 2.0]])
    assert i2[3].point3d_ids[0] == 7
    np.testing.assert_allclose(p2.xyz, pts.xyz)
    assert (p2.rgb == pts.rgb).all()


def test_qvec_rotmat_inverse():
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec_to_rotmat(q)
        np.testing.assert_allclose(rotmat_to_qvec(R), q, atol=1e-8)


def test_point_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(10, 3))
    rgb = np.random.default_rng(1).random((10, 3))
    save_point_ply(str(tmp_path / "p.ply"), xyz, rgb)
    x2, c2 = load_point_ply(str(tmp_path / "p.ply"))
    np.testing.assert_allclose(x2, xyz, atol=1e-6)
    np.testing.assert_allclose(c2, rgb, atol=1 / 255)
