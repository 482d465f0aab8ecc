"""Shared synthetic-avatar fixtures: tiny FLAME model + rendered dataset."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.models.binding import face_frames
from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets
from gaussianavatars_tpu.models.flame.flame_model import zero_params
from gaussianavatars_tpu.models.gaussians import init_bound, world_gaussians
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig, render_tiled

N_SHAPE, N_EXPR = 8, 4
W, H = 64, 48
TILE = dict(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16)


def tiny_sphere_obj(path, n_lat=12, n_lon=16):
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


def make_flame_model(tmpdir) -> FlameModel:
    obj = os.path.join(str(tmpdir), "sphere.obj")
    tiny_sphere_obj(obj)
    assets = synthetic_assets(n_shape=N_SHAPE, n_expr=N_EXPR, seed=0, template_obj=obj)
    return FlameModel(assets, FlameConfig(n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False))


def reference_avatar(model, capacity=1024, seed=7):
    """A 'trained' avatar: visible opacity + moderate scales."""
    params, aux = init_bound(model.num_faces, capacity=capacity, key=jax.random.PRNGKey(seed))
    params = dataclasses.replace(
        params, logit_opacity=jnp.full_like(params.logit_opacity, 2.0),
        log_scales=jnp.full_like(params.log_scales, np.log(0.6)),
    )
    return params, aux


def write_rendered_dataset(root, model, params, aux, timesteps=2, cams=2):
    """Render GT from the avatar and write a DynamicNerf-format dataset."""
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "flame_param"), exist_ok=True)
    center = np.asarray(model.assets.v_template.mean(0))
    extent = float(np.abs(np.asarray(model.assets.v_template) - center).max())
    tcfg = TileConfig(**TILE)
    frames_meta = []
    for t in range(timesteps):
        jaw = jnp.zeros((1, 3)).at[0, 0].set(0.1 * t)
        fl = zero_params(N_SHAPE, N_EXPR, batch=1)._replace(jaw=jaw)
        verts = model.forward(fl)
        fr = face_frames(verts[0], model.faces)
        np.savez(
            os.path.join(root, "flame_param", f"{t}.npz"),
            shape=np.zeros(N_SHAPE, np.float32),
            expr=np.zeros((1, N_EXPR), np.float32),
            rotation=np.zeros((1, 3), np.float32),
            neck_pose=np.zeros((1, 3), np.float32),
            jaw_pose=np.asarray(jaw, np.float32),
            eyes_pose=np.zeros((1, 6), np.float32),
            translation=np.zeros((1, 3), np.float32),
            static_offset=np.zeros((1, model.num_verts, 3), np.float32),
        )
        for c in range(cams):
            dx = -0.4 + 0.8 * c / max(cams - 1, 1)
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
            Image.fromarray((img * 255).astype(np.uint8)).save(os.path.join(root, name))
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
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": frames_meta}, f)
    return root
