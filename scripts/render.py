#!/usr/bin/env python
"""Offline rendering of train/val/test splits (or a reenactment target).

Reference-parity driver (`render.py:54-146`): loads the trained model dir,
renders each split's views with the trained FLAME sequence, writes
`renders/` and `gt/` PNGs under `<model>/<split>_<iteration>/`, and
assembles an mp4 when ffmpeg is present. PNG encoding runs on a thread pool
off the TPU dispatch path.
"""
from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_val", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--render_mesh", action="store_true",
                   help="overlay the FLAME mesh preview (mesh_renderer)")
    p.add_argument("--n_frames", type=int, default=0, help="cap frames per split")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--flame_assets", type=str,
                   default=os.environ.get("GSAVATARS_FLAME_ASSETS", ""))
    return p.parse_args(argv)


def write_png(path, img):
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def main(argv=None):
    a = parse_args(argv)
    import jax.numpy as jnp

    from gaussianavatars_tpu.config import from_json
    from gaussianavatars_tpu.data.pipeline import load_view
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.io import checkpoint_ply_path, find_latest_iteration, load_avatar
    from gaussianavatars_tpu.training.loop import (
        flame_init_from_table, make_render_fn, tile_config,
    )
    from gaussianavatars_tpu.training.trainer import FlameStatic, FlameTrainable, TrainState
    from gaussianavatars_tpu.training.optim import adam_init

    with open(os.path.join(a.model_path, "cfg_args.json")) as f:
        cfg = from_json(f.read())

    iteration = find_latest_iteration(a.model_path) if a.iteration == -1 else a.iteration
    ply = checkpoint_ply_path(a.model_path, iteration)
    params, aux, flame_table = load_avatar(ply, capacity=cfg.model.capacity)
    print(f"loaded {ply}: {int(np.asarray(aux.alive).sum())} Gaussians")

    model = None
    if flame_table is not None:
        saved_assets = os.path.join(a.model_path, "flame_assets.npz")
        if os.path.exists(saved_assets):
            from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel
            from gaussianavatars_tpu.models.flame.assets import load_assets

            assets = load_assets(saved_assets)
            model = FlameModel(assets, FlameConfig(
                n_shape=assets.n_shape,
                n_expr=assets.shapedirs.shape[-1] - assets.n_shape,
                add_teeth=False,  # saved assets already include augmentation
            ))
        else:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from train import load_flame_model

            model = load_flame_model(cfg, a.flame_assets)
        fi = flame_init_from_table(
            flame_table, n_shape=model.cfg.n_shape, n_expr=model.cfg.n_expr
        )
        flame = FlameTrainable(
            expr=jnp.asarray(fi["expr"]), rotation=jnp.asarray(fi["rotation"]),
            neck=jnp.asarray(fi["neck"]), jaw=jnp.asarray(fi["jaw"]),
            eyes=jnp.asarray(fi["eyes"]), translation=jnp.asarray(fi["translation"]),
        )
        static = FlameStatic(
            shape=jnp.asarray(fi["shape"]),
            static_offset=jnp.asarray(
                np.asarray(fi["static_offset"]).reshape(-1, 3)[: model.num_verts]
            ),
        )
    else:
        flame = static = None

    state = TrainState(
        params=params, aux=aux, adam=adam_init(params), flame=flame,
        flame_static=static, flame_adam=None, color_net=None, color_adam=None,
        contrastive=None, key=jnp.zeros((2,), jnp.uint32),
    )

    scene = Scene(
        cfg.model.source_path, resolution=cfg.model.resolution,
        white_background=cfg.model.white_background, eval_split=cfg.model.eval,
        target_path=cfg.model.target_path,
        select_camera_id=cfg.model.select_camera_id,
        num_verts_hint=model.num_verts if model else 0,
    )
    render_fn = make_render_fn(model, cfg, tile_config(cfg))
    bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)

    def mesh_overlay(img, cam, t, weight=0.5):
        """Alpha-blend the FLAME mesh preview over the splat render
        (reference `render.py` mesh option via NVDiffRenderer)."""
        from gaussianavatars_tpu.models.flame.flame_model import FlameParams
        from gaussianavatars_tpu.ops.mesh_raster import render_mesh_preview

        fp = FlameParams(
            shape=static.shape,
            expr=flame.expr[t][None], rotation=flame.rotation[t][None],
            neck=flame.neck[t][None], jaw=flame.jaw[t][None],
            eyes=flame.eyes[t][None], translation=flame.translation[t][None],
            static_offset=static.static_offset,
        )
        verts = model.forward(fp)[0]
        out = render_mesh_preview(verts, model.faces, cam)
        rgb = np.asarray(out["rgba"][..., :3])
        alpha = np.asarray(out["rgba"][..., 3:])
        return rgb * alpha * weight + img * (alpha * (1 - weight) + (1 - alpha))

    if a.render_mesh and model is None:
        print("[warn] --render_mesh ignored: model has no FLAME binding")

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=8)
    for split, skip in (("train", a.skip_train), ("val", a.skip_val),
                        ("test", a.skip_test)):
        if skip or not scene.cameras(split):
            continue
        out_dir = os.path.join(a.model_path, split, f"ours_{iteration}")
        rdir, gdir = os.path.join(out_dir, "renders"), os.path.join(out_dir, "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        cams = scene.cameras(split)
        recs = scene.records(split)
        n = len(cams) if a.n_frames <= 0 else min(a.n_frames, len(cams))
        from gaussianavatars_tpu.data.cameras import jit_static_key

        for i in range(n):
            img = np.asarray(render_fn(
                state, jit_static_key(cams[i]), jnp.int32(cams[i].timestep), bg,
                cfg.model.sh_degree,
            ))
            if a.render_mesh and model is not None:
                img = mesh_overlay(img, cams[i], int(cams[i].timestep))
            gt = load_view(recs[i], cams[i])
            pool.submit(write_png, os.path.join(rdir, f"{i:05d}.png"), img)
            pool.submit(write_png, os.path.join(gdir, f"{i:05d}.png"), gt)
            if not a.quiet and i % 20 == 0:
                print(f"[{split}] {i}/{n}")
        pool.shutdown(wait=True)
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=8)
        if shutil.which("ffmpeg"):
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", str(a.fps), "-i",
                 os.path.join(rdir, "%05d.png"), "-pix_fmt", "yuv420p",
                 os.path.join(out_dir, "renders.mp4")],
                check=False, capture_output=True,
            )
    pool.shutdown(wait=True)
    print("done")


if __name__ == "__main__":
    main()
