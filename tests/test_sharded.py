"""Multi-chip sharded train step on a virtual 8-device CPU mesh.

Checks the replicated-state invariant and exact equivalence with the
single-chip step (same camera, data=1, tile=8)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.config import Config
from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets
from gaussianavatars_tpu.models.gaussians import init_bound, init_from_points
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig
from gaussianavatars_tpu.parallel.mesh import make_device_mesh
from gaussianavatars_tpu.parallel.sharded import (
    camera_batch,
    make_sharded_train_step,
    pad_gt_for_mesh,
    padded_height,
)
from gaussianavatars_tpu.training.trainer import init_train_state, make_train_step

TILE = TileConfig(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=16)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def unbound_setup(n=50, cap=64, width=48, height=64):
    rng = np.random.RandomState(0)
    pts = rng.randn(n, 3).astype(np.float32) * 0.3
    cols = rng.rand(n, 3).astype(np.float32)
    params, aux = init_from_points(
        pts, cols, capacity=cap, init_scale=np.full(n, 0.08, np.float32)
    )
    cam = look_at_camera(eye=(0, 0, -2.5), fovy=0.8, width=width, height=height)
    gt = jnp.tile(jnp.array([0.3, 0.5, 0.7]), (cam.height, cam.width, 1))
    return params, aux, cam, gt


def test_sharded_matches_single_chip():
    params, aux, cam, gt = unbound_setup()
    cfg = Config()
    mesh = make_device_mesh(data=1, tile=8)

    # Independent buffers: both steps donate their state.
    state_a = init_train_state(params, aux, cfg)
    params2, aux2, _, _ = unbound_setup()
    state_b = init_train_state(params2, aux2, cfg)

    step1 = make_train_step(None, cfg, TILE)
    out = step1(state_a, gt, cam, jnp.int32(0), jnp.zeros(3), sh_degree=0)

    stepN = make_sharded_train_step(None, cfg, TILE, mesh, cam)
    hp = padded_height(cam.height, TILE.tile_h, 8)
    gt_b = pad_gt_for_mesh(gt[None], hp)
    cams = camera_batch([cam])
    new_state, metrics = stepN(state_b, cams, gt_b, jnp.zeros(3), sh_degree=0)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(out.metrics["loss"]), rtol=1e-4
    )
    for name in ["means", "log_scales", "quats", "logit_opacity"]:
        a = np.asarray(getattr(out.state.params, name))
        b = np.asarray(getattr(new_state.params, name))
        np.testing.assert_allclose(b, a, atol=5e-5, err_msg=name)
    # Densification statistics agree too.
    np.testing.assert_allclose(
        np.asarray(new_state.aux.grad_accum),
        np.asarray(out.state.aux.grad_accum),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.aux.denom), np.asarray(out.state.aux.denom)
    )


def test_sharded_data_parallel_runs():
    params, aux, cam, gt = unbound_setup()
    cfg = Config()
    mesh = make_device_mesh(data=2, tile=4)
    state = init_train_state(params, aux, cfg)
    stepN = make_sharded_train_step(None, cfg, TILE, mesh, cam)
    hp = padded_height(cam.height, TILE.tile_h, 4)
    cam2 = look_at_camera(eye=(0.3, 0.1, -2.4), fovy=0.8, width=cam.width, height=cam.height)
    cams = camera_batch([cam, cam2])
    gt_b = pad_gt_for_mesh(jnp.stack([gt, gt * 0.5]), hp)
    state, metrics = stepN(state, cams, gt_b, jnp.zeros(3), sh_degree=0)
    assert np.isfinite(float(metrics["loss"]))
    # Step again to confirm the state stays consistent/replicated.
    state, metrics2 = stepN(state, cams, gt_b, jnp.zeros(3), sh_degree=0)
    assert float(metrics2["loss"]) < float(metrics["loss"]) * 1.5


def test_gauss_shard_matches_single_chip():
    """Dual-role axis: geometry sharded over Gaussians, compositing over rows."""
    params, aux, cam, gt = unbound_setup(cap=64)  # chunk = 8 per device
    cfg = Config()
    mesh = make_device_mesh(data=1, tile=8)

    state_a = init_train_state(params, aux, cfg)
    params2, aux2, _, _ = unbound_setup(cap=64)
    state_b = init_train_state(params2, aux2, cfg)

    step1 = make_train_step(None, cfg, TILE)
    out = step1(state_a, gt, cam, jnp.int32(0), jnp.zeros(3), sh_degree=0)

    stepN = make_sharded_train_step(None, cfg, TILE, mesh, cam, gauss_shard=True)
    hp = padded_height(cam.height, TILE.tile_h, 8)
    gt_b = pad_gt_for_mesh(gt[None], hp)
    new_state, metrics = stepN(state_b, camera_batch([cam]), gt_b, jnp.zeros(3), sh_degree=0)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(out.metrics["loss"]), rtol=1e-4
    )
    for name in ["means", "log_scales", "quats", "logit_opacity", "sh_dc"]:
        a = np.asarray(getattr(out.state.params, name))
        b = np.asarray(getattr(new_state.params, name))
        np.testing.assert_allclose(b, a, atol=5e-5, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(new_state.aux.grad_accum),
        np.asarray(out.state.aux.grad_accum),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.aux.denom), np.asarray(out.state.aux.denom)
    )


def test_innovations_match_single_chip():
    """Region-adaptive L1 + color net + contrastive reg through the sharded
    step must reproduce the single-chip step exactly (data=1, tile=8)."""
    from gaussianavatars_tpu.config import OptimizationConfig

    params, aux, cam, gt = unbound_setup()
    cfg = Config(opt=OptimizationConfig(
        use_region_adaptive_loss=True,
        use_color_calibration=True,
        use_contrastive_reg=True,
    ))
    mesh = make_device_mesh(data=1, tile=8)
    hw = (cam.height, cam.width)

    state_a = init_train_state(params, aux, cfg, image_hw=hw)
    params2, aux2, _, _ = unbound_setup()
    state_b = init_train_state(params2, aux2, cfg, image_hw=hw)

    step1 = make_train_step(None, cfg, TILE)
    out = step1(state_a, gt, cam, jnp.int32(0), jnp.zeros(3), sh_degree=0)

    stepN = make_sharded_train_step(None, cfg, TILE, mesh, cam)
    hp = padded_height(cam.height, TILE.tile_h, 8)
    new_state, metrics = stepN(
        state_b, camera_batch([cam]), pad_gt_for_mesh(gt[None], hp),
        jnp.zeros(3), sh_degree=0,
    )

    np.testing.assert_allclose(
        float(metrics["loss"]), float(out.metrics["loss"]), rtol=1e-4
    )
    for name in ["means", "log_scales", "quats", "logit_opacity"]:
        np.testing.assert_allclose(
            np.asarray(getattr(new_state.params, name)),
            np.asarray(getattr(out.state.params, name)),
            atol=5e-5, err_msg=name,
        )
    # Color-net weights stepped identically; contrastive cache holds the
    # same downsampled render.
    for wa, wb in zip(out.state.color_net.weights, new_state.color_net.weights):
        np.testing.assert_allclose(np.asarray(wb), np.asarray(wa), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.contrastive.images),
        np.asarray(out.state.contrastive.images),
        atol=1e-5,
    )


def test_mixed_intrinsics_match_single_chip():
    """data=2 with per-camera fovs: the sharded per-view EWA Jacobian must
    use each camera's own focal (a template-fov bug would skew conics)."""
    params, aux, cam, gt = unbound_setup()
    cfg = Config()
    mesh = make_device_mesh(data=2, tile=4)
    cam2 = look_at_camera(eye=(0.2, 0.1, -2.0), fovy=1.2,  # different fov
                          width=cam.width, height=cam.height)
    gt2 = gt * 0.5

    # Single-chip per-camera losses from the same initial state.
    state = init_train_state(params, aux, cfg)
    step1 = make_train_step(None, cfg, TILE)
    losses = []
    for c, g in ((cam, gt), (cam2, gt2)):
        st = jax.tree_util.tree_map(jnp.array, state)
        losses.append(float(step1(st, g, c, jnp.int32(0), jnp.zeros(3),
                                  sh_degree=0).metrics["loss"]))

    stepN = make_sharded_train_step(None, cfg, TILE, mesh, cam)
    hp = padded_height(cam.height, TILE.tile_h, 4)
    st = jax.tree_util.tree_map(jnp.array, state)
    _, metrics = stepN(st, camera_batch([cam, cam2]),
                       pad_gt_for_mesh(jnp.stack([gt, gt2]), hp),
                       jnp.zeros(3), sh_degree=0)
    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(losses), rtol=1e-4
    )


def test_gauss_shard_flame_bound_runs():
    """FLAME-bound + gauss_shard over a (data=2, tile=4) mesh updates FLAME."""
    assets = synthetic_assets(n_shape=8, n_expr=4, seed=0)
    model = FlameModel(assets, FlameConfig(n_shape=8, n_expr=4, add_teeth=False))
    params, aux = init_bound(model.num_faces, capacity=1 << 14, key=jax.random.PRNGKey(0))
    center = np.asarray(assets.v_template.mean(0))
    extent = float(np.abs(assets.v_template - center).max())
    cam = look_at_camera(
        eye=center + np.array([0, 0, -4 * extent]), target=center, fovy=0.5,
        width=32, height=32,
    )
    cfg = Config()
    mesh = make_device_mesh(data=2, tile=4)
    state = init_train_state(
        params, aux, cfg, num_timesteps=2, n_expr=4, n_shape=8,
        num_verts=model.num_verts,
    )
    expr_before = np.asarray(state.flame.expr)
    stepN = make_sharded_train_step(model, cfg, TILE, mesh, cam, gauss_shard=True)
    hp = padded_height(cam.height, TILE.tile_h, 4)
    gt = jnp.tile(jnp.array([0.2, 0.2, 0.2]), (cam.height, cam.width, 1))
    cams = camera_batch([cam, dataclasses.replace(cam, timestep=1)])
    gt_b = pad_gt_for_mesh(jnp.stack([gt, gt]), hp)
    state, metrics = stepN(state, cams, gt_b, jnp.zeros(3), sh_degree=0)
    assert np.isfinite(float(metrics["loss"]))
    assert np.abs(np.asarray(state.flame.expr) - expr_before).sum() > 0


def test_sharded_flame_bound_runs():
    assets = synthetic_assets(n_shape=8, n_expr=4, seed=0)
    model = FlameModel(assets, FlameConfig(n_shape=8, n_expr=4, add_teeth=False))
    params, aux = init_bound(model.num_faces, capacity=1 << 14, key=jax.random.PRNGKey(0))
    center = np.asarray(assets.v_template.mean(0))
    extent = float(np.abs(assets.v_template - center).max())
    cam = look_at_camera(
        eye=center + np.array([0, 0, -4 * extent]), target=center, fovy=0.5,
        width=32, height=32,
    )
    from gaussianavatars_tpu.config import OptimizationConfig

    cfg = Config(opt=OptimizationConfig(lambda_laplacian=0.1))  # laplacian on
    mesh = make_device_mesh(data=2, tile=4)
    state = init_train_state(
        params, aux, cfg, num_timesteps=2, n_expr=4, n_shape=8,
        num_verts=model.num_verts,
    )
    expr_before = np.asarray(state.flame.expr)
    stepN = make_sharded_train_step(model, cfg, TILE, mesh, cam)
    hp = padded_height(cam.height, TILE.tile_h, 4)
    gt = jnp.tile(jnp.array([0.2, 0.2, 0.2]), (cam.height, cam.width, 1))
    cams = camera_batch([cam, dataclasses.replace(cam, timestep=1)])
    gt_b = pad_gt_for_mesh(jnp.stack([gt, gt]), hp)
    state, metrics = stepN(state, cams, gt_b, jnp.zeros(3), sh_degree=0)
    assert np.isfinite(float(metrics["loss"]))
    d = np.abs(np.asarray(state.flame.expr) - expr_before)
    assert d.sum() > 0  # FLAME params updated through the sharded chain
