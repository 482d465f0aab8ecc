#!/usr/bin/env python
"""Training CLI — reference-parity flags (`train.py:397-427`,
`arguments/__init__.py:47-144`) over the TPU-native loop.

Example (NeRSemble-preprocessed avatar):
    python scripts/train.py -s data/306 -m output/306 --bind_to_mesh --eval \
        --flame_assets assets/flame2023.npz
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatars_tpu.config import (
    Config, ModelConfig, OptimizationConfig, PipelineConfig,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GaussianAvatars-TPU trainer")
    # ModelParams (`arguments/__init__.py:47-67`)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--bind_to_mesh", action="store_true")
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--target_path", "-t", type=str, default="")
    p.add_argument("--select_camera_id", type=int, default=-1)
    p.add_argument("--capacity", type=int, default=131072)
    # FLAME assets
    p.add_argument("--flame_assets", type=str, default=os.environ.get("GSAVATARS_FLAME_ASSETS", ""),
                   help="converted flame2023 npz (see assets.convert_flame_pickle); "
                        "synthetic topology is used if absent")
    p.add_argument("--disable_teeth", action="store_true")
    # OptimizationParams (subset; the rest come from config defaults)
    p.add_argument("--iterations", type=int, default=600_000)
    p.add_argument("--interval", type=int, default=10_000,
                   help="eval/save cadence (`train.py:406-421`)")
    p.add_argument("--densify_from_iter", type=int, default=10_000)
    p.add_argument("--densify_until_iter", type=int, default=600_000)
    p.add_argument("--densification_interval", type=int, default=2_000)
    p.add_argument("--opacity_reset_interval", type=int, default=60_000)
    p.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    p.add_argument("--lambda_dssim", type=float, default=0.2)
    p.add_argument("--lambda_xyz", type=float, default=1e-2)
    p.add_argument("--lambda_scale", type=float, default=1.0)
    p.add_argument("--lambda_laplacian", type=float, default=0.0)
    p.add_argument("--port", type=int, default=60000, help="viewer GUI port (0 = off)")
    # Innovations (`arguments/__init__.py:110-144`)
    p.add_argument("--use_region_adaptive_loss", action="store_true")
    p.add_argument("--use_smart_densification", action="store_true")
    p.add_argument("--use_progressive_resolution", action="store_true")
    p.add_argument("--use_color_calibration", action="store_true")
    p.add_argument("--use_contrastive_reg", action="store_true")
    p.add_argument("--all_innovations", action="store_true")
    # Runtime
    p.add_argument("--start_checkpoint", type=str, default="")
    p.add_argument("--test_iterations", type=int, nargs="*", default=None)
    p.add_argument("--save_iterations", type=int, nargs="*", default=None)
    p.add_argument("--checkpoint_iterations", type=int, nargs="*", default=None)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--detect_anomaly", action="store_true",
                   help="jax_debug_nans: re-run jitted fns eagerly on NaN "
                        "(reference --detect_anomaly, train.py:423-424)")
    p.add_argument("--debug_from", type=int, default=-1,
                   help="from this iteration: per-step finite assertions on "
                        "metrics/params, single-step dispatch (reference "
                        "--debug_from, train.py:189-190)")
    p.add_argument("--color_net_lr", type=float, default=1e-3)
    p.add_argument("--use_amp", action="store_true",
                   help="mixed-precision policy: bf16 MXU inputs for SSIM "
                        "blurs and backward-compositor contractions, f32 "
                        "accumulation/state (reference AMP, train.py:69-72)")
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=str, default="",
                   help="multi-chip mesh 'DATAxTILE' (e.g. 2x4): train with "
                        "cameras sharded over 'data' and tile rows over "
                        "'tile' (parallel/sharded.py)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize before any "
                        "backend use; mesh spans all processes' devices "
                        "(docs/multichip.md)")
    p.add_argument("--coordinator_address", type=str, default="",
                   help="host:port of process 0 (auto-discovered on Cloud "
                        "TPU; env JAX_COORDINATOR_ADDRESS also honoured)")
    p.add_argument("--num_processes", type=int, default=-1)
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--gauss_shard", action="store_true",
                   help="with --mesh: also shard per-Gaussian geometry over "
                        "the tile axis")
    p.add_argument("--steps_per_call", type=int, default=50,
                   help="train steps per jitted dispatch (lax.scan chunks)")
    return p.parse_args(argv)


def config_from_args(a) -> Config:
    inn = a.all_innovations
    return Config(
        model=ModelConfig(
            source_path=a.source_path, model_path=a.model_path,
            sh_degree=a.sh_degree, bind_to_mesh=a.bind_to_mesh,
            white_background=a.white_background, resolution=a.resolution,
            eval=a.eval, target_path=a.target_path,
            select_camera_id=a.select_camera_id, capacity=a.capacity,
            add_teeth=not a.disable_teeth,
        ),
        pipeline=PipelineConfig(use_pallas=not a.no_pallas),
        opt=OptimizationConfig(
            iterations=a.iterations,
            densify_from_iter=a.densify_from_iter,
            densify_until_iter=a.densify_until_iter,
            densification_interval=a.densification_interval,
            opacity_reset_interval=a.opacity_reset_interval,
            densify_grad_threshold=a.densify_grad_threshold,
            lambda_dssim=a.lambda_dssim, lambda_xyz=a.lambda_xyz,
            lambda_scale=a.lambda_scale, lambda_laplacian=a.lambda_laplacian,
            use_region_adaptive_loss=a.use_region_adaptive_loss or inn,
            use_smart_densification=a.use_smart_densification or inn,
            use_progressive_resolution=a.use_progressive_resolution or inn,
            use_color_calibration=a.use_color_calibration or inn,
            use_contrastive_reg=a.use_contrastive_reg or inn,
            color_net_lr=a.color_net_lr,
            use_amp=a.use_amp,
        ),
    )


def load_flame_model(cfg: Config, flame_assets: str):
    from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel
    from gaussianavatars_tpu.models.flame.assets import load_assets, synthetic_assets

    fc = FlameConfig(
        n_shape=cfg.model.n_shape, n_expr=cfg.model.n_expr,
        add_teeth=cfg.model.add_teeth,
    )
    if flame_assets and os.path.exists(flame_assets):
        assets = load_assets(flame_assets)
    else:
        print("[warn] no FLAME assets npz — using synthetic statistical model "
              "(real training needs the licensed FLAME 2023 files; see "
              "gaussianavatars_tpu/models/flame/assets.py)")
        assets = synthetic_assets(n_shape=fc.n_shape, n_expr=fc.n_expr, seed=0)
    return FlameModel(assets, fc)


def main(argv=None):
    a = parse_args(argv)
    if a.distributed:
        # Must precede every other JAX call (device queries included).
        from gaussianavatars_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=a.coordinator_address or None,
            num_processes=a.num_processes if a.num_processes > 0 else None,
            process_id=a.process_id if a.process_id >= 0 else None,
        )
    cfg = config_from_args(a)
    if a.detect_anomaly:
        from gaussianavatars_tpu.utils.debug import enable_nan_debugging

        enable_nan_debugging()
        print("[debug] jax_debug_nans enabled (--detect_anomaly)")
    from gaussianavatars_tpu.training.loop import build_harness, train

    model = load_flame_model(cfg, a.flame_assets) if a.bind_to_mesh else None
    harness = build_harness(cfg, model=model, start_checkpoint=a.start_checkpoint)

    iv = a.interval
    tests = a.test_iterations if a.test_iterations is not None else list(
        range(iv, a.iterations + 1, iv)
    )
    saves = a.save_iterations if a.save_iterations is not None else sorted(
        set(list(range(iv * 6, a.iterations + 1, iv * 6)) + [a.iterations])
    )
    ckpts = a.checkpoint_iterations if a.checkpoint_iterations is not None else sorted(
        set(list(range(iv * 6, a.iterations + 1, iv * 6)) + [a.iterations])
    )

    from gaussianavatars_tpu.parallel.distributed import is_coordinator

    gui = None
    if a.port and is_coordinator():
        try:
            from gaussianavatars_tpu.viewers.network_gui import TrainingGuiServer

            gui = TrainingGuiServer("0.0.0.0", a.port)
            print(f"viewer GUI listening on :{a.port}")
        except Exception as e:
            print(f"[warn] GUI server unavailable: {e}")

    # Serviced every dispatch (reference: every iteration, train.py:143-172).
    gui_service = (lambda it: gui.service(harness, it)) if gui else None

    if a.mesh:
        from gaussianavatars_tpu.parallel.mesh import make_device_mesh
        from gaussianavatars_tpu.training.loop import train_sharded

        d, t = (int(x) for x in a.mesh.lower().split("x"))
        train_sharded(
            harness,
            make_device_mesh(data=d, tile=t),
            iterations=a.iterations,
            log_every=a.log_every,
            eval_every=None,
            eval_iterations=tests,
            save_iterations=saves,
            checkpoint_iterations=ckpts,
            gauss_shard=a.gauss_shard,
            seed=a.seed,
            gui_service=gui_service,
            debug_from=a.debug_from,
        )
    else:
        train(
            harness,
            iterations=a.iterations,
            log_every=a.log_every,
            eval_every=None,
            eval_iterations=tests,
            save_iterations=saves,
            checkpoint_iterations=ckpts,
            seed=a.seed,
            steps_per_call=a.steps_per_call,
            gui_service=gui_service,
            debug_from=a.debug_from,
        )


if __name__ == "__main__":
    main()
