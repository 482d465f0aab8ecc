#!/usr/bin/env python
"""FPS benchmark using a dataset camera (reference `fps_benchmark_dataset.py`).

Loads the trained model dir + its dataset, renders the first test/val camera
`n_iter`×`n_rounds` times with per-frame FLAME mesh updates.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--split", default="test")
    p.add_argument("--n_iter", type=int, default=500)
    p.add_argument("--n_rounds", type=int, default=3)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gaussianavatars_tpu.config import from_json
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.io import checkpoint_ply_path
    from gaussianavatars_tpu.viewers.local import AvatarViewerCore
    from gaussianavatars_tpu.models.binding import face_frames
    from gaussianavatars_tpu.models.gaussians import world_gaussians
    from gaussianavatars_tpu.ops.rasterize_tiled import render_tiled

    with open(os.path.join(a.model_path, "cfg_args.json")) as f:
        cfg = from_json(f.read())
    core = AvatarViewerCore(checkpoint_ply_path(a.model_path, a.iteration))
    scene = Scene(
        cfg.model.source_path, resolution=cfg.model.resolution,
        white_background=cfg.model.white_background, eval_split=cfg.model.eval,
        num_verts_hint=core.model.num_verts if core.model else 0,
    )
    cams = scene.cameras(a.split) or scene.cameras("train")
    cam = cams[0]
    print(f"{core.num_points} Gaussians; view {cam.width}x{cam.height}")

    def frame(c, i):
        img, s = c
        fp = core.flame_params_at(0)
        fp = fp._replace(jaw=fp.jaw + s * 1e-9)
        verts = core.model.forward(fp)
        frames = face_frames(verts[0], core.model.faces)
        wg = world_gaussians(core.params, core.aux, frames)
        out = render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
            sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=core.tile,
            use_pallas=core.use_pallas,
        )
        return (out.color, s + out.color[0, 0, 0] * 0)

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, a.n_iter, lambda i, c: frame(c, i), c)

    init = (jnp.zeros((cam.height, cam.width, 3)), jnp.zeros(()))
    r = run(init); np.asarray(r[1])
    for rd in range(a.n_rounds):
        t0 = time.perf_counter()
        r = run(init); np.asarray(r[1])
        print(f"round {rd}: {a.n_iter / (time.perf_counter() - t0):.1f} FPS")


if __name__ == "__main__":
    main()
