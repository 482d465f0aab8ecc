"""End-to-end train-step tests: loss decreases, grads flow to FLAME, innovations run."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.config import Config, OptimizationConfig
from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets
from gaussianavatars_tpu.models.gaussians import init_bound, init_from_points
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig
from gaussianavatars_tpu.training.trainer import (
    active_sh_degree,
    init_train_state,
    make_train_step,
)

TILE = TileConfig(tile_h=16, tile_w=16, capacity=256, max_tiles_per_gaussian=16)


def unbound_setup(n=60, cap=64):
    rng = np.random.RandomState(0)
    pts = rng.randn(n, 3).astype(np.float32) * 0.3
    cols = rng.rand(n, 3).astype(np.float32)
    params, aux = init_from_points(pts, cols, capacity=cap, init_scale=np.full(n, 0.08, np.float32))
    cam = look_at_camera(eye=(0, 0, -2.5), fovy=0.8, width=48, height=32)
    # Target: a render of a perturbed copy → non-trivial but reachable.
    gt = jnp.tile(jnp.array([0.3, 0.5, 0.7]), (cam.height, cam.width, 1))
    return params, aux, cam, gt


def test_unbound_loss_decreases():
    params, aux, cam, gt = unbound_setup()
    cfg = Config()
    state = init_train_state(params, aux, cfg)
    step = make_train_step(None, cfg, TILE)
    bg = jnp.zeros(3)
    losses = []
    for i in range(60):
        out = step(state, gt, cam, jnp.int32(0), bg, sh_degree=0)
        state = out.state
        losses.append(float(out.metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert np.isfinite(losses).all()


def test_train_step_jit_cache():
    params, aux, cam, gt = unbound_setup()
    cfg = Config()
    state = init_train_state(params, aux, cfg)
    step = make_train_step(None, cfg, TILE)
    bg = jnp.zeros(3)
    out = step(state, gt, cam, jnp.int32(0), bg, sh_degree=0)
    n_start = step._cache_size() if hasattr(step, "_cache_size") else None
    out = step(out.state, gt, cam, jnp.int32(0), bg, sh_degree=0)
    if n_start is not None:
        assert step._cache_size() == n_start  # no retrace on second call


def test_flame_bound_step_jit_cache():
    """Bound-state leaves must be strongly typed: a weak-typed leaf (e.g.
    logit_opacity from jnp.full with a python float) strengthens after one
    step, changing the jit cache key → silent ~40 s recompile on call 2."""
    model, params, aux, cam, gt = flame_setup()
    cfg = Config()
    state = init_train_state(
        params, aux, cfg, num_timesteps=2, n_expr=4, n_shape=8,
        num_verts=model.num_verts,
    )
    for leaf in jax.tree_util.tree_leaves(state):
        assert not getattr(leaf, "weak_type", False), "weak-typed state leaf"
    step = make_train_step(model, cfg, TILE)
    bg = jnp.zeros(3)
    out = step(state, gt, cam, jnp.int32(0), bg, sh_degree=0)
    n_start = step._cache_size() if hasattr(step, "_cache_size") else None
    out = step(out.state, gt, cam, jnp.int32(0), bg, sh_degree=0)
    if n_start is not None:
        assert step._cache_size() == n_start  # no retrace on second call


def flame_setup():
    assets = synthetic_assets(n_shape=8, n_expr=4, seed=0)
    model = FlameModel(assets, FlameConfig(n_shape=8, n_expr=4, add_teeth=False))
    params, aux = init_bound(model.num_faces, capacity=1 << 14, key=jax.random.PRNGKey(0))
    center = np.asarray(assets.v_template.mean(0))
    extent = float(np.abs(assets.v_template - center).max())
    cam = look_at_camera(
        eye=center + np.array([0, 0, -4 * extent]), target=center, fovy=0.5,
        width=48, height=48,
    )
    gt = jnp.tile(jnp.array([0.2, 0.2, 0.2]), (cam.height, cam.width, 1))
    return model, params, aux, cam, gt


def test_flame_bound_step_updates_flame_params():
    model, params, aux, cam, gt = flame_setup()
    cfg = Config()
    state = init_train_state(
        params, aux, cfg, num_timesteps=3, n_expr=4, n_shape=8,
        num_verts=model.num_verts,
    )
    step = make_train_step(model, cfg, TILE)
    expr_before = np.asarray(state.flame.expr)  # snapshot: state is donated
    out = step(state, gt, cam, jnp.int32(1), jnp.zeros(3), sh_degree=0)
    # The selected timestep's expression moved; others untouched.
    d = np.abs(np.asarray(out.state.flame.expr) - expr_before)
    assert d[1].sum() > 0
    assert d[0].sum() == 0 and d[2].sum() == 0
    assert np.isfinite(float(out.metrics["loss"]))
    # Densification stats accumulated for visible Gaussians.
    assert float(out.state.aux.denom.sum()) > 0


def test_innovations_enabled_smoke():
    model, params, aux, cam, gt = flame_setup()
    cfg = Config(opt=OptimizationConfig(
        use_region_adaptive_loss=True,
        use_color_calibration=True,
        use_contrastive_reg=True,
        lambda_laplacian=0.01,
    ))
    state = init_train_state(
        params, aux, cfg, num_timesteps=2, n_expr=4, n_shape=8,
        num_verts=model.num_verts, image_hw=(cam.height, cam.width),
    )
    step = make_train_step(model, cfg, TILE)
    out = step(state, gt, cam, jnp.int32(0), jnp.zeros(3), sh_degree=0)
    m = out.metrics
    for k in ["l1", "ssim", "color_reg", "lap"]:
        assert k in m and np.isfinite(float(m[k])), k
    # Contrastive cache advanced.
    assert int(out.state.contrastive.count) == 1
    out2 = step(out.state, gt, cam, jnp.int32(1), jnp.zeros(3), sh_degree=0)
    assert int(out2.state.contrastive.count) == 2
    assert float(out2.metrics.get("contrastive", 0.0)) >= 0.0


def test_sh_warmup_schedule():
    assert active_sh_degree(0) == 0
    assert active_sh_degree(999) == 0
    assert active_sh_degree(1000) == 1
    assert active_sh_degree(3500) == 3
    assert active_sh_degree(99999) == 3


def test_adaptive_pool_matches_torch():
    """_downsample == F.adaptive_avg_pool2d (the reference pools renders to a
    fixed 8x8 thumbnail, contrastive_regularization.py:18,26) — including
    non-divisible sizes, so the cache survives progressive-resolution swaps."""
    import torch
    import torch.nn.functional as F

    from gaussianavatars_tpu.training.innovations import _downsample

    rng = np.random.RandomState(3)
    for (h, w), out in [((64, 48), 8), ((55, 41), 8), ((23, 37), 5)]:
        img = rng.rand(h, w, 3).astype(np.float32)
        got = np.asarray(_downsample(jnp.asarray(img), out))
        ref = (
            F.adaptive_avg_pool2d(
                torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0), out
            )[0].permute(1, 2, 0).numpy()
        )
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_contrastive_cache_resolution_independent():
    from gaussianavatars_tpu.training.innovations import (
        contrastive_init, contrastive_loss, contrastive_update,
    )

    cache = contrastive_init(2, 96, 128, downsample=8)
    big = jnp.ones((96, 128, 3)) * 0.5
    small = jnp.ones((48, 64, 3)) * 0.5
    cache = contrastive_update(cache, big, 8)
    # A half-resolution render (progressive milestone) hits the same cache.
    loss = contrastive_loss(cache, small, 8)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)  # same content


def test_region_weight_map_matches_rasterizer_convention():
    """The weight boxes must land on the pixels the region renders to: same
    NDC→pixel orientation as ops/projection.ndc_to_pixel (no y flip).
    Regression test for a vertical mirror that sent eye weights to the
    bottom of the image."""
    from gaussianavatars_tpu.ops.projection import ndc_to_pixel
    from gaussianavatars_tpu.training.innovations import flame_region_weight_map

    h, w = 96, 64
    cam = look_at_camera(eye=(0, 0, -2.5), fovy=0.8, width=w, height=h)
    # One vertex clearly off-centre vertically.
    vert = jnp.array([[0.15, 0.4, 0.0]], jnp.float32)
    wmap = flame_region_weight_map(
        vert, {"mouth": np.array([0], np.int32)}, cam, h, w
    )
    # Project the same vertex with the rasterizer's convention.
    full = cam.full_proj
    hom = jnp.concatenate([vert[0], jnp.ones(1)]) @ full.T
    ndc = hom[:2] / hom[3]
    px = int(ndc_to_pixel(ndc[0], w))
    py = int(ndc_to_pixel(ndc[1], h))
    assert 0 <= px < w and 0 <= py < h
    assert float(wmap[py, px]) > 1.0, "weight box missing at the rendered pixel"
    mirrored = h - 1 - py
    if abs(mirrored - py) > 2 * (max(h, w) // 60) + 2:
        assert float(wmap[mirrored, px]) == 1.0, "weight box vertically mirrored"
