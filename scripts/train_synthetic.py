#!/usr/bin/env python
"""Self-contained end-to-end system check: recover a known synthetic avatar.

Renders a DynamicNerf-format dataset from a randomized reference avatar
(real FLAME template topology when available), then trains a fresh model on
it with the full production loop (densification, SH warm-up, eval) and
reports PSNR against the generating avatar. A healthy run reaches
~28-35 dB val PSNR in a few thousand iterations — if it does not, something
in the render/grad/optimize chain is broken.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianavatars_tpu.models.flame.assets import bootstrap_template_env

bootstrap_template_env()

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/gsav_synthetic")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--timesteps", type=int, default=10)
    p.add_argument("--cameras", type=int, default=6)
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--capacity", type=int, default=65536)
    p.add_argument("--per_face", type=int, default=2)
    p.add_argument("--n_shape", type=int, default=50)
    p.add_argument("--n_expr", type=int, default=20)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--steps_per_call", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--all_innovations", action="store_true",
                   help="run the 5 training innovations (progressive "
                        "resolution milestones at 1/3 and 2/3 of the run)")
    p.add_argument("--use_amp", action="store_true")
    p.add_argument("--opacity_reset_interval", type=int, default=0,
                   help="0 = never (default); the quality profile sets this "
                        "so resets actually fire like the 600k recipe")
    p.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="also write a resume checkpoint every N iterations "
                        "(0 = final only); long quality campaigns survive "
                        "a crash/preemption with --start_checkpoint")
    p.add_argument("--start_checkpoint", default="",
                   help="resume a previous run from this TrainState .npz")
    p.add_argument("--json_out", default="",
                   help="write the log trajectory + final eval metrics here")
    p.add_argument("--quality", action="store_true",
                   help="the QUALITY.md operating point: 802x550, initial "
                        "1/face splats grown by densification, opacity "
                        "resets, SH warm-up, all 5 innovations "
                        "(VERDICT round-1 item 3)")
    return p.parse_args(argv)


def build_reference_avatar(a):
    import jax
    import jax.numpy as jnp

    from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets
    from gaussianavatars_tpu.models.gaussians import init_bound, inverse_sigmoid

    assets = synthetic_assets(n_shape=a.n_shape, n_expr=a.n_expr, seed=a.seed)
    model = FlameModel(assets, FlameConfig(n_shape=a.n_shape, n_expr=a.n_expr,
                                           add_teeth=True))
    key = jax.random.PRNGKey(a.seed + 7)
    params, aux = init_bound(model.num_faces, capacity=a.capacity, key=key,
                             per_face=a.per_face)
    k1, k2, k3 = jax.random.split(key, 3)
    params = dataclasses.replace(
        params,
        means=jax.random.normal(k1, params.means.shape) * 0.15,
        log_scales=jnp.log(jax.random.uniform(
            k2, params.log_scales.shape, minval=0.3, maxval=0.8)),
        quats=jax.random.normal(k3, params.quats.shape),
        logit_opacity=jnp.full_like(params.logit_opacity,
                                    float(inverse_sigmoid(0.9))),
    )
    return model, params, aux


def write_dataset(a, model, params, aux):
    import json

    import jax.numpy as jnp
    from PIL import Image

    from gaussianavatars_tpu.data.cameras import look_at_camera
    from gaussianavatars_tpu.models.binding import face_frames
    from gaussianavatars_tpu.models.flame.flame_model import zero_params
    from gaussianavatars_tpu.models.gaussians import world_gaussians
    from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig, render_tiled

    root = a.workdir
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "flame_param"), exist_ok=True)
    center = np.asarray(model.assets.v_template.mean(0))
    extent = float(np.abs(np.asarray(model.assets.v_template) - center).max())
    tcfg = TileConfig(32, 32, 512, 8)
    rng = np.random.default_rng(a.seed)
    frames_meta = []
    for t in range(a.timesteps):
        jaw = np.zeros((1, 3), np.float32)
        jaw[0, 0] = 0.25 * t / max(a.timesteps - 1, 1)
        expr = (rng.normal(size=(1, a.n_expr)) * 0.3).astype(np.float32)
        np.savez(
            os.path.join(root, "flame_param", f"{t}.npz"),
            shape=np.zeros(a.n_shape, np.float32), expr=expr,
            rotation=np.zeros((1, 3), np.float32),
            neck_pose=np.zeros((1, 3), np.float32), jaw_pose=jaw,
            eyes_pose=np.zeros((1, 6), np.float32),
            translation=np.zeros((1, 3), np.float32),
            static_offset=np.zeros((1, model.num_verts, 3), np.float32),
        )
        fl = zero_params(a.n_shape, a.n_expr, batch=1)._replace(
            jaw=jnp.asarray(jaw), expr=jnp.asarray(expr))
        verts = model.forward(fl)
        fr = face_frames(verts[0], model.faces)
        wg = world_gaussians(params, aux, fr)
        for c in range(a.cameras):
            ang = -0.5 + 1.0 * c / max(a.cameras - 1, 1)
            eye = center + np.array([
                np.sin(ang) * 4 * extent, 0.0, -np.cos(ang) * 4 * extent,
            ])
            cam = look_at_camera(eye=eye, target=center, fovy=0.5,
                                 width=a.width, height=a.height)
            out = render_tiled(
                wg.means, wg.scales, wg.quats, wg.opacity, cam, jnp.zeros(3),
                sh=wg.sh, sh_degree=0, alive=wg.alive, cfg=tcfg,
                use_pallas=not a.no_pallas,
            )
            img = np.asarray(jnp.clip(out.color, 0, 1))
            name = f"images/t{t:03d}_c{c}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, name))
            w2c = np.eye(4)
            w2c[:3, :] = np.asarray(cam.world_view)[:3, :]
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            frames_meta.append({
                "file_path": name, "transform_matrix": c2w.tolist(),
                "timestep_index": t, "camera_index": c,
                "camera_angle_x": float(cam.fovx),
                "flame_param_path": f"flame_param/{t}.npz",
                "w": a.width, "h": a.height,
            })
    # Reference split semantics (dataset_readers: held-out TIMESTEPS are the
    # test set — self-reenactment with known FLAME params on seen cameras —
    # while val is a held-out CAMERA, i.e. novel view). A middle timestep is
    # held out so test interpolates rather than extrapolates the jaw arc.
    t_test = a.timesteps // 2
    train = [f for f in frames_meta
             if f["camera_index"] != 0 and f["timestep_index"] != t_test]
    val = [f for f in frames_meta
           if f["camera_index"] == 0 and f["timestep_index"] != t_test]
    test = [f for f in frames_meta
            if f["timestep_index"] == t_test and f["camera_index"] != 0]
    for split, fr_list in (("train", train), ("val", val), ("test", test)):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": fr_list}, f)
    print(f"dataset: {len(train)} train / {len(val)} val (novel view) / "
          f"{len(test)} test (novel timestep {t_test}) views at "
          f"{a.width}x{a.height}, {a.timesteps} timesteps")


def apply_quality_profile(a, parser_defaults):
    """The QUALITY.md operating point (VERDICT round-1 item 3): the
    reference benchmark geometry (802x550, `fps_benchmark_demo.py:76-80`)
    with the full 600k recipe scaled down — densification growing the
    splat count toward the ~90k operating point, periodic opacity resets,
    SH warm-up, and all five innovations. Only overrides knobs the user
    left at their defaults."""
    def default(name, value):
        if getattr(a, name) == parser_defaults[name]:
            setattr(a, name, value)

    default("width", 802)
    default("height", 550)
    default("iterations", 24_000)
    default("capacity", 131072)
    default("timesteps", 12)
    default("cameras", 8)
    default("workdir", "/tmp/gsav_quality")
    default("opacity_reset_interval", a.iterations // 10)
    a.all_innovations = True


def main(argv=None):
    a = parse_args(argv)
    if a.cameras < 2:
        raise SystemExit("--cameras must be >= 2 (camera 0 is held out "
                         "for the val split; 1 camera leaves no train views)")
    if a.quality:
        apply_quality_profile(a, vars(parse_args([])))
    from gaussianavatars_tpu.config import (
        Config, ModelConfig, OptimizationConfig, PipelineConfig,
    )
    from gaussianavatars_tpu.training.loop import build_harness, train
    from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets

    ref_model, ref_params, ref_aux = build_reference_avatar(a)
    import json as _json

    # Reuse the rendered dataset only when the generating configuration
    # matches — otherwise metrics would be attributed to settings that
    # never ran.
    meta_keys = ("width", "height", "timesteps", "cameras", "seed",
                 "per_face", "n_shape", "n_expr")
    meta = {k: getattr(a, k) for k in meta_keys}
    meta["split_ver"] = 2   # held-out-timestep test split (regenerates v1)
    meta_path = os.path.join(a.workdir, "dataset_meta.json")
    reuse = False
    if os.path.exists(os.path.join(a.workdir, "transforms_train.json")):
        try:
            with open(meta_path) as f:
                reuse = _json.load(f) == meta
        except Exception:
            reuse = False
    if reuse:
        print(f"reusing dataset at {a.workdir}")
    else:
        write_dataset(a, ref_model, ref_params, ref_aux)
        with open(meta_path, "w") as f:
            _json.dump(meta, f)

    innov = {}
    if a.all_innovations:
        # Milestones at 1/3 and 2/3 of the run (reference: 100k/300k of 600k,
        # config defaults `arguments/__init__.py:76-144`).
        innov = dict(
            use_region_adaptive_loss=True,
            use_smart_densification=True,
            use_progressive_resolution=True,
            resolution_schedule=(0.5, 0.75, 1.0),
            resolution_milestones=(a.iterations // 3, 2 * a.iterations // 3),
            use_color_calibration=True,
            use_contrastive_reg=True,
        )
    cfg = Config(
        model=ModelConfig(
            source_path=a.workdir, model_path=os.path.join(a.workdir, "model"),
            bind_to_mesh=True, capacity=a.capacity, n_shape=a.n_shape,
            n_expr=a.n_expr, add_teeth=True, eval=True, sh_degree=3,
        ),
        pipeline=PipelineConfig(
            tile_h=32, tile_w=32, capacity_per_tile=512,
            max_tiles_per_gaussian=8, use_pallas=not a.no_pallas,
        ),
        opt=OptimizationConfig(
            iterations=a.iterations,
            position_lr_max_steps=a.iterations,
            densify_from_iter=500, densify_until_iter=a.iterations,
            densification_interval=250,
            opacity_reset_interval=(a.opacity_reset_interval or
                                    10 * a.iterations),
            densify_grad_threshold=a.densify_grad_threshold,
            lambda_scale=0.1,
            use_amp=a.use_amp,
            **innov,
        ),
    )
    # Train model uses the same topology (synthetic assets are deterministic).
    model = FlameModel(
        synthetic_assets(n_shape=a.n_shape, n_expr=a.n_expr, seed=a.seed),
        FlameConfig(n_shape=a.n_shape, n_expr=a.n_expr, add_teeth=True),
    )
    harness = build_harness(cfg, model=model,
                            start_checkpoint=a.start_checkpoint)
    ckpts = sorted({a.iterations} | (
        set(range(a.checkpoint_every, a.iterations + 1, a.checkpoint_every))
        if a.checkpoint_every > 0 else set()
    ))
    logs = train(
        harness, iterations=a.iterations, log_every=a.log_every,
        eval_every=a.eval_every, save_iterations=[a.iterations],
        checkpoint_iterations=ckpts, seed=a.seed,
        steps_per_call=a.steps_per_call,
    )
    print(f"first logged loss {logs[0]['loss']:.4f} → last {logs[-1]['loss']:.4f}; "
          f"train psnr {logs[-1]['psnr']:.2f} dB; "
          f"{logs[-1]['num_points']} Gaussians")

    # Final full-split eval at full resolution (training_report analogue,
    # reference train.py:313-394). Generous per-tile capacity: training may
    # have grown the splat count well past what the training tcfg assumed.
    import dataclasses as _dc
    import json

    from gaussianavatars_tpu.training.loop import (
        active_sh_degree, evaluate_split, make_render_fn, tile_config,
    )

    # The loop may have GROWN the tile budgets (overflow recovery) — the
    # final eval must render with at least those, or the headline metrics
    # are measured on partially rendered frames.
    live = harness.live_tile_config or tile_config(cfg)
    eval_tcfg = _dc.replace(live, capacity=max(live.capacity, 1024))
    render_fn = make_render_fn(model, cfg, eval_tcfg)
    sh_deg = active_sh_degree(a.iterations, cfg.model.sh_degree)
    result = {"args": {k: v for k, v in vars(a).items()}, "logs": logs}
    for split in ("val", "test"):
        m = evaluate_split(harness, split, render_fn, sh_deg)
        if m:
            extra = f" lpips={m['lpips']:.4f}" if "lpips" in m else ""
            print(f"[final eval {split}] psnr={m['psnr']:.2f} "
                  f"ssim={m['ssim']:.4f}{extra} over {m['n']} views")
            result[f"eval_{split}"] = m
    if a.json_out:
        with open(a.json_out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {a.json_out}")
    return logs


if __name__ == "__main__":
    main()
