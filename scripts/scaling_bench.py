#!/usr/bin/env python
"""Scaling-efficiency harness: sharded train step over growing device meshes.

BASELINE.md asks for scaling efficiency at 1 chip / 1 host / ≥2 hosts. This
script runs the ('data','tile') sharded step (parallel/sharded.py) on
whatever devices are available and reports iters/s per mesh shape.

With one real TPU chip (this pod) it benchmarks mesh (1,1) on device; pass
--cpu N to validate mesh logic and measure collective overheads on N virtual
CPU devices (XLA collectives execute identically; absolute numbers are not
TPU numbers). On a real multi-chip slice the same code scales tile/data.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatars_tpu.models.flame.assets import bootstrap_template_env

bootstrap_template_env()

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", type=int, default=0,
                   help="use N virtual CPU devices instead of the TPU")
    p.add_argument("--width", type=int, default=802)
    p.add_argument("--height", type=int, default=544)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--capacity", type=int, default=131072)
    p.add_argument("--meshes", type=str, default="",
                   help="comma list like 1x1,1x2,2x2,1x8 (data x tile)")
    p.add_argument("--gauss_shard", action="store_true",
                   help="also shard per-Gaussian geometry over the tile axis")
    p.add_argument("--unsharded", action="store_true",
                   help="time the plain (non-shard_map) train step on the "
                        "same scene instead — the mesh-(1,1) denominator")
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    if a.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={a.cpu}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from gaussianavatars_tpu.config import Config, ModelConfig, OptimizationConfig, PipelineConfig
    from gaussianavatars_tpu.parallel.mesh import make_device_mesh
    from gaussianavatars_tpu.parallel.sharded import (
        camera_batch, make_sharded_train_step, pad_gt_for_mesh, padded_height,
    )
    from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig
    from gaussianavatars_tpu.training.trainer import init_train_state
    from gaussianavatars_tpu.data.cameras import resolution_scaled

    devices = jax.devices()
    nd = len(devices)
    print(f"{nd} devices: {devices[0].platform}")
    per_face = 1 if a.cpu else 9
    model, params, aux, fl, cam0, n = build_scene(per_face=per_face)
    cam0 = dataclasses.replace(cam0, width=a.width, height=a.height)
    tile_cfg = TileConfig(32, 32, 512, 8)
    cfg = Config(model=ModelConfig(capacity=a.capacity, n_shape=100, n_expr=50))

    if a.unsharded:
        # Plain jitted step on one device: the denominator for the
        # mesh-(1,1) shard_map-overhead ratio (same scene/shapes/loss).
        from gaussianavatars_tpu.training.trainer import make_train_step
        from gaussianavatars_tpu.data.cameras import jit_static_key

        state = init_train_state(
            jax.tree_util.tree_map(jnp.array, params),
            jax.tree_util.tree_map(jnp.array, aux),
            cfg, num_timesteps=2, n_expr=50, n_shape=100,
            num_verts=model.num_verts,
        )
        step = make_train_step(model, cfg, tile_cfg)
        cam = jit_static_key(cam0)
        gt = jnp.tile(jnp.array([0.4, 0.4, 0.4]),
                      (cam0.height, cam0.width, 1))
        bg = jnp.zeros(3)
        out = step(state, gt, cam, jnp.int32(0), bg, sh_degree=3)
        jax.block_until_ready(out.metrics["loss"])
        t0 = time.perf_counter()
        st = out.state
        for _ in range(a.iters):
            out = step(st, gt, cam, jnp.int32(0), bg, sh_degree=3)
            st = out.state
        float(out.metrics["loss"])
        dt = (time.perf_counter() - t0) / a.iters
        print(f"unsharded step: {dt*1000:7.1f} ms/iter ({1.0/dt:5.2f} iters/s)")
        return {"unsharded": 1.0 / dt}

    if a.meshes:
        shapes = []
        for s in a.meshes.split(","):
            d, t = s.lower().split("x")
            shapes.append((int(d), int(t)))
    else:
        shapes = []
        t = 1
        while t <= nd:
            shapes.append((1, t))
            t *= 2
        if nd >= 4:
            shapes.append((2, nd // 2))

    results = {}
    for data, tile in shapes:
        if data * tile > nd:
            continue
        mesh = make_device_mesh(data=data, tile=tile, devices=devices[: data * tile])
        hp = padded_height(cam0.height, tile_cfg.tile_h, tile)
        # Fresh copies per mesh shape: the step donates its input state.
        state = init_train_state(
            jax.tree_util.tree_map(jnp.array, params),
            jax.tree_util.tree_map(jnp.array, aux),
            cfg, num_timesteps=max(2, data), n_expr=50, n_shape=100,
            num_verts=model.num_verts,
        )
        step = make_sharded_train_step(
            model, cfg, tile_cfg, mesh, cam0, gauss_shard=a.gauss_shard
        )
        cams = camera_batch([dataclasses.replace(cam0, timestep=i % 2)
                             for i in range(data)])
        gt = pad_gt_for_mesh(
            jnp.tile(jnp.array([0.4, 0.4, 0.4]), (data, cam0.height, cam0.width, 1)),
            hp,
        )
        bg = jnp.zeros(3)
        new_state, metrics = step(state, cams, gt, bg, sh_degree=3)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        st = new_state
        for _ in range(a.iters):
            st, metrics = step(st, cams, gt, bg, sh_degree=3)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / a.iters
        ips = 1.0 / dt
        results[(data, tile)] = ips
        cams_per_s = ips * data
        print(f"mesh data={data} tile={tile}: {dt*1000:7.1f} ms/iter "
              f"({ips:5.2f} iters/s, {cams_per_s:5.2f} cameras/s)")
    if (1, 1) in results:
        base = results[(1, 1)]
        for k, v in results.items():
            d, t = k
            print(f"  ({d}x{t}) speedup vs single: {v * d / base:.2f}x "
                  f"(efficiency {v * d / base / (d * t):.0%})")
    return results


if __name__ == "__main__":
    main()
