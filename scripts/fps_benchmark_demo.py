#!/usr/bin/env python
"""FPS benchmark on a trained avatar (reference protocol).

`fps_benchmark_demo.py:53-80` equivalent: a fixed OrbitCamera view at
802×550, 500 renders × 3 rounds, FLAME mesh update included in every frame.
Timing is done with the renders chained inside one jitted loop (the TPU
analogue of CUDA-event timing — host dispatch noise excluded).
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
    p.add_argument("point_path", help="trained point_cloud.ply")
    p.add_argument("--flame_assets", default="")
    p.add_argument("--width", type=int, default=802)
    p.add_argument("--height", type=int, default=550)
    p.add_argument("--n_iter", type=int, default=500)
    p.add_argument("--n_rounds", type=int, default=3)
    p.add_argument("--no_pallas", action="store_true")
    return p.parse_args(argv)


def run_benchmark(core, n_iter: int, n_rounds: int, animate_timesteps: bool = True):
    """Chained-render FPS measurement. Returns list of per-round FPS."""
    import jax
    import jax.numpy as jnp

    from gaussianavatars_tpu.models.binding import face_frames
    from gaussianavatars_tpu.models.gaussians import world_gaussians
    from gaussianavatars_tpu.ops.rasterize_tiled import render_tiled

    cam = core.cam.to_camera()
    T = core.num_timesteps

    def frame(c, i):
        img, s = c
        if core.model is not None:
            fp = core.flame_params_at(0)
            if animate_timesteps:
                # mesh update every frame, like the reference demo
                fp = fp._replace(jaw=fp.jaw + s * 1e-9)
            verts = core.model.forward(fp)
            frames = face_frames(verts[0], core.model.faces)
        else:
            frames = None
        wg = world_gaussians(core.params, core.aux, frames)
        out = render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
            sh=wg.sh, sh_degree=3, alive=wg.alive, cfg=core.tile,
            use_pallas=core.use_pallas,
        )
        return (out.color, s + out.color[0, 0, 0] * 0)

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, n_iter, lambda i, c: frame(c, i), c)

    init = (jnp.zeros((cam.height, cam.width, 3)), jnp.zeros(()))
    r = run(init)
    np.asarray(r[1])  # warm-up compile + execute
    fps = []
    for _ in range(n_rounds):
        t0 = time.perf_counter()
        r = run(init)
        np.asarray(r[1])
        fps.append(n_iter / (time.perf_counter() - t0))
    return fps


def main(argv=None):
    a = parse_args(argv)
    from gaussianavatars_tpu.viewers.local import AvatarViewerCore

    core = AvatarViewerCore(
        a.point_path, flame_assets=a.flame_assets,
        width=a.width, height=a.height,
        use_pallas=None if not a.no_pallas else False,
    )
    print(f"{core.num_points} Gaussians, {core.num_timesteps} timesteps")
    fps = run_benchmark(core, a.n_iter, a.n_rounds)
    for i, f in enumerate(fps):
        print(f"round {i}: {f:.1f} FPS")
    print(f"mean: {np.mean(fps):.1f} FPS at {a.width}x{a.height}")


if __name__ == "__main__":
    main()
