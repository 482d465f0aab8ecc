#!/usr/bin/env python
"""Real multi-process distributed check (VERDICT r4 item 6).

Launches TWO OS processes on this host, each a `jax.distributed` CPU
process with 4 virtual devices (8 global devices → mesh data=2, tile=4),
and runs the production `train_sharded` step end-to-end across them:

  * `parallel.distributed.initialize` with an explicit local coordinator;
  * `local_data_rows` + `make_global_batch` assembling global jax.Arrays
    from per-process GT rows (the multi-host data path);
  * ~8 sharded train steps with donated state;
  * one eval-style local render copy (the `loop.py` local-copy detach) and
    a rank-gated save — the two places a collective/IO mismatch deadlocks
    outside the single-process virtual mesh.

Exit 0 = both processes finished, losses finite and bit-identical across
processes, coordinator wrote the artifact. Run: python scripts/multiproc_check.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("GSAVATARS_MP_PORT", "19731"))
N_PROC = 2
DEV_PER_PROC = 4
STEPS = 8


def worker(pid: int, out_dir: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gaussianavatars_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.device_count() == N_PROC * DEV_PER_PROC

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from gaussianavatars_tpu.config import Config
    from gaussianavatars_tpu.data.cameras import look_at_camera
    from gaussianavatars_tpu.models.gaussians import init_from_points
    from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig
    from gaussianavatars_tpu.parallel.mesh import make_device_mesh
    from gaussianavatars_tpu.parallel.sharded import (
        camera_batch, make_sharded_train_step, pad_gt_for_mesh, padded_height,
    )
    from gaussianavatars_tpu.training.trainer import init_train_state

    tile = TileConfig(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16)
    mesh = make_device_mesh(data=2, tile=4)
    n_tile = mesh.shape["tile"]

    # Deterministic scene on every process (replicated-state invariant).
    rng = np.random.RandomState(0)
    pts = rng.randn(48, 3).astype(np.float32) * 0.3
    cols = rng.rand(48, 3).astype(np.float32)
    params, aux = init_from_points(
        pts, cols, capacity=64, init_scale=np.full(48, 0.08, np.float32)
    )
    cam0 = look_at_camera(eye=(0, 0, -2.5), fovy=0.8, width=32, height=32)
    cam1 = look_at_camera(eye=(0.3, 0.1, -2.4), fovy=0.8, width=32, height=32)
    cfg = Config()
    state = init_train_state(params, aux, cfg)
    step = make_sharded_train_step(None, cfg, tile, mesh, cam0)

    hp = padded_height(cam0.height, tile.tile_h, n_tile)
    gt_full = np.stack([
        np.tile(np.array([0.3, 0.5, 0.7], np.float32), (cam0.height, cam0.width, 1)),
        np.tile(np.array([0.6, 0.2, 0.1], np.float32), (cam0.height, cam0.width, 1)),
    ])
    gt_full = np.asarray(pad_gt_for_mesh(jnp.asarray(gt_full), hp))
    cams = camera_batch([cam0, cam1])

    rows = dist.local_data_rows(mesh)
    assert rows, f"process {pid} owns no data rows"
    losses = []
    for it in range(STEPS):
        # Per-process GT fetch for OWN rows only → global array.
        gt_local = gt_full[np.asarray(rows)]
        cams_g, gt_g = dist.make_global_batch(mesh, cams, gt_local, rows)
        state, metrics = step(state, cams_g, gt_g, jnp.zeros(3), sh_degree=0)
        loss = float(metrics["loss"])  # global scalar: collective-consistent
        assert np.isfinite(loss), loss
        losses.append(loss)

        if it == STEPS // 2:
            # Eval-style detach: pull a LOCAL addressable copy of the
            # replicated params (loop.py:494-505's deadlock-avoidance
            # pattern) and rank-gate the save.
            host_params = jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x.addressable_data(0))),
                state.params,
            )
            if dist.is_coordinator():
                np.savez(
                    os.path.join(out_dir, "ckpt.npz"), means=host_params.means
                )

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
        json.dump({"losses": losses}, f)
    print(f"[proc {pid}] done, losses {losses[0]:.5f} -> {losses[-1]:.5f}")


def main() -> int:
    out_dir = tempfile.mkdtemp(prefix="gsav_mp_")
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    for pid in range(N_PROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
             out_dir],
            env=env, cwd=REPO,
        ))
    rcs = [p.wait(timeout=1500) for p in procs]
    assert all(rc == 0 for rc in rcs), f"worker exit codes {rcs}"
    logs = [json.load(open(os.path.join(out_dir, f"proc{p}.json")))
            for p in range(N_PROC)]
    assert logs[0]["losses"] == logs[1]["losses"], (
        "loss trajectories diverged across processes", logs
    )
    assert os.path.exists(os.path.join(out_dir, "ckpt.npz")), "no rank-0 save"
    assert logs[0]["losses"][-1] < logs[0]["losses"][0], "loss did not drop"
    print(f"multiproc check OK: {N_PROC} processes x {DEV_PER_PROC} devices, "
          f"{STEPS} steps, loss {logs[0]['losses'][0]:.5f} -> "
          f"{logs[0]['losses'][-1]:.5f}, rank-0 save present")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        sys.exit(main())
