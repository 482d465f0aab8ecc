"""End-to-end training loop on a tiny synthetic avatar dataset.

The dataset's ground truth is *rendered from a known Gaussian avatar*, so the
loop must actually reduce the loss (not just run).
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.config import Config, ModelConfig, OptimizationConfig, PipelineConfig
from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.models.binding import face_frames
from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets
from gaussianavatars_tpu.models.flame.flame_model import zero_params
from gaussianavatars_tpu.models.gaussians import init_bound, world_gaussians
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig, render_tiled
from gaussianavatars_tpu.training.loop import (
    build_harness, evaluate_split, flame_table_from_state, make_render_fn, train,
)

N_SHAPE, N_EXPR = 8, 4
W, H = 64, 48


def _tiny_sphere_obj(path, n_lat=12, n_lon=16):
    """Small UV-sphere OBJ (~178 verts / 352 faces) to keep CPU tests fast."""
    lines = []
    verts = []
    for i in range(1, n_lat):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append((np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph)))
    verts.append((0.0, 1.0, 0.0))
    verts.append((0.0, -1.0, 0.0))
    top, bot = len(verts) - 1, len(verts)  # 1-based below
    for x, y, z in verts:
        lines.append(f"v {x:.6f} {y:.6f} {z:.6f}")
    lines.append("vt 0.5 0.5")
    faces = []
    for i in range(n_lat - 2):
        for j in range(n_lon):
            a = i * n_lon + j + 1
            b = i * n_lon + (j + 1) % n_lon + 1
            c = a + n_lon
            d = b + n_lon
            faces.append((a, b, c))
            faces.append((b, d, c))
    for j in range(n_lon):
        faces.append((top, j + 1, (j + 1) % n_lon + 1))
        base = (n_lat - 2) * n_lon
        faces.append((bot + 1, base + (j + 1) % n_lon + 1, base + j + 1))
    for a, b, c in faces:
        lines.append(f"f {a}/1 {b}/1 {c}/1")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def flame_model(tmp_path_factory):
    obj = tmp_path_factory.mktemp("mesh") / "sphere.obj"
    _tiny_sphere_obj(str(obj))
    assets = synthetic_assets(
        n_shape=N_SHAPE, n_expr=N_EXPR, seed=0, template_obj=str(obj)
    )
    return FlameModel(assets, FlameConfig(n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False))


@pytest.fixture(scope="module")
def rendered_dataset(tmp_path_factory, flame_model):
    """Render GT images from a reference avatar with known colors."""
    from PIL import Image

    model = flame_model
    root = tmp_path_factory.mktemp("rendered_ds")
    os.makedirs(root / "images")
    os.makedirs(root / "flame_param")

    key = jax.random.PRNGKey(7)
    params, aux = init_bound(model.num_faces, capacity=1024, key=key)
    params = dataclasses.replace(
        params, logit_opacity=jnp.full_like(params.logit_opacity, 2.0),
        log_scales=jnp.full_like(params.log_scales, np.log(0.6)),
    )
    center = np.asarray(model.assets.v_template.mean(0))
    extent = float(np.abs(np.asarray(model.assets.v_template) - center).max())
    tcfg = TileConfig(tile_h=8, tile_w=16, capacity=256, max_tiles_per_gaussian=16)

    frames_meta = []
    for t in range(2):
        jaw = jnp.zeros((1, 3)).at[0, 0].set(0.1 * t)
        fl = zero_params(N_SHAPE, N_EXPR, batch=1)._replace(jaw=jaw)
        verts = model.forward(fl)
        fr = face_frames(verts[0], model.faces)
        np.savez(
            root / "flame_param" / f"{t}.npz",
            shape=np.zeros(N_SHAPE, np.float32),
            expr=np.zeros((1, N_EXPR), np.float32),
            rotation=np.zeros((1, 3), np.float32),
            neck_pose=np.zeros((1, 3), np.float32),
            jaw_pose=np.asarray(jaw, np.float32),
            eyes_pose=np.zeros((1, 6), np.float32),
            translation=np.zeros((1, 3), np.float32),
            static_offset=np.zeros((1, model.num_verts, 3), np.float32),
        )
        for c, dx in ((0, -0.4), (1, 0.4)):
            cam = look_at_camera(
                eye=center + np.array([dx * extent, 0.0, -4 * extent]),
                target=center, fovy=0.6, width=W, height=H,
            )
            wg = world_gaussians(params, aux, fr)
            out = render_tiled(
                wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
                sh=wg.sh, sh_degree=0, alive=wg.alive, cfg=tcfg, use_pallas=False,
            )
            img = np.asarray(jnp.clip(out.color, 0, 1))
            name = f"images/t{t}_c{c}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(root / name)
            # Camera → NeRF transform_matrix (c2w, OpenGL axes).
            w2c = np.eye(4)
            w2c[:3, :] = np.asarray(cam.world_view)[:3, :]
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            frames_meta.append({
                "file_path": name,
                "transform_matrix": c2w.tolist(),
                "timestep_index": t,
                "camera_index": c,
                "camera_angle_x": float(cam.fovx),
                "flame_param_path": f"flame_param/{t}.npz",
                "w": W, "h": H,
            })
    for split in ("train", "val", "test"):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"frames": frames_meta}, f)
    return root


def _config(root, model_path="", iters=60):
    return Config(
        model=ModelConfig(
            source_path=str(root), model_path=model_path, bind_to_mesh=True,
            capacity=1024, n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False,
            sh_degree=3, eval=True,
        ),
        pipeline=PipelineConfig(
            tile_h=8, tile_w=16, capacity_per_tile=128, max_tiles_per_gaussian=16,
            use_pallas=False,  # scan path on CPU (pallas parity has its own tests)
        ),
        opt=OptimizationConfig(
            iterations=iters, densify_from_iter=20, densify_until_iter=50,
            densification_interval=15, opacity_reset_interval=10_000,
            position_lr_max_steps=iters, lambda_scale=0.1,
        ),
    )


def test_train_loss_decreases(rendered_dataset, flame_model, tmp_path):
    cfg = _config(rendered_dataset, model_path=str(tmp_path / "out"))
    harness = build_harness(cfg, model=flame_model)
    assert harness.scene.num_timesteps == 2
    logs = train(
        harness, iterations=60, log_every=10, eval_every=0,
        save_iterations=[60], checkpoint_iterations=[60],
        prefetch_workers=2,
    )
    first, last = logs[0], logs[-1]
    assert last["loss"] < first["loss"] * 0.8, (first, last)
    assert np.isfinite(last["loss"])
    # Artifacts
    out = tmp_path / "out"
    assert (out / "cfg_args.json").exists()
    assert (out / "cameras.json").exists()
    assert (out / "point_cloud" / "iteration_60" / "point_cloud.ply").exists()
    assert (out / "point_cloud" / "iteration_60" / "flame_param.npz").exists()
    assert (out / "chkpnt60.npz").exists()
    side = np.load(out / "point_cloud" / "iteration_60" / "flame_param.npz")
    assert side["expr"].shape == (2, N_EXPR)


def test_resume_from_checkpoint(rendered_dataset, flame_model, tmp_path):
    cfg = _config(rendered_dataset, model_path=str(tmp_path / "o1"))
    h1 = build_harness(cfg, model=flame_model)
    train(h1, iterations=10, log_every=5, eval_every=0,
          checkpoint_iterations=[10], prefetch_workers=2)
    ckpt = str(tmp_path / "o1" / "chkpnt10.npz")
    assert os.path.exists(ckpt)

    h2 = build_harness(cfg, model=flame_model, start_checkpoint=ckpt)
    assert h2.start_iteration == 10
    np.testing.assert_allclose(
        np.asarray(h2.state.params.means), np.asarray(h1.state.params.means)
    )
    np.testing.assert_allclose(
        np.asarray(h2.state.adam.mu.means), np.asarray(h1.state.adam.mu.means)
    )
    logs = train(h2, iterations=14, log_every=2, eval_every=0, prefetch_workers=2)
    assert logs[-1]["iteration"] == 14


def test_evaluate_split(rendered_dataset, flame_model):
    cfg = _config(rendered_dataset)
    harness = build_harness(cfg, model=flame_model)
    from gaussianavatars_tpu.training.loop import tile_config

    render_fn = make_render_fn(flame_model, cfg, tile_config(cfg))
    m = evaluate_split(harness, "val", render_fn, sh_degree=0, max_views=2)
    assert m["n"] == 2 and np.isfinite(m["psnr"]) and 0 <= m["ssim"] <= 1


def test_densify_changes_point_count(rendered_dataset, flame_model):
    cfg = _config(rendered_dataset)
    harness = build_harness(cfg, model=flame_model)
    from gaussianavatars_tpu.models.gaussians import num_alive
    n0 = int(num_alive(harness.state.aux))
    logs = train(harness, iterations=55, log_every=55, eval_every=0,
                 prefetch_workers=2)
    n1 = logs[-1]["num_points"]
    assert n1 != n0 or n1 == harness.cfg.model.capacity  # events ran


def test_train_cli_parse():
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    import importlib
    train_mod = importlib.import_module("train")
    a = train_mod.parse_args([
        "-s", "/tmp/x", "-m", "/tmp/y", "--bind_to_mesh", "--eval",
        "--all_innovations", "--iterations", "1000",
    ])
    cfg = train_mod.config_from_args(a)
    assert cfg.opt.use_region_adaptive_loss and cfg.opt.use_contrastive_reg
    assert cfg.opt.iterations == 1000 and cfg.model.bind_to_mesh
