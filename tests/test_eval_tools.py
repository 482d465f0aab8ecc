"""LPIPS metric, avatar PLY loading, and the render/metrics CLIs."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures_avatar import (
    N_EXPR, N_SHAPE, TILE, make_flame_model, reference_avatar, write_rendered_dataset,
)
from gaussianavatars_tpu.metrics import lpips, synthetic_lpips_params
from gaussianavatars_tpu.models.io import (
    checkpoint_ply_path, find_latest_iteration, load_avatar,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def flame_model(tmp_path_factory):
    return make_flame_model(tmp_path_factory.mktemp("mesh"))


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory, flame_model):
    """A 'trained' model dir: dataset + cfg_args + saved PLY/npz."""
    from gaussianavatars_tpu.config import (
        Config, ModelConfig, OptimizationConfig, PipelineConfig, to_json,
    )
    from gaussianavatars_tpu.data.scene import Scene

    root = tmp_path_factory.mktemp("ds")
    params, aux = reference_avatar(flame_model)
    write_rendered_dataset(str(root), flame_model, params, aux)
    model_path = str(tmp_path_factory.mktemp("model"))
    cfg = Config(
        model=ModelConfig(
            source_path=str(root), model_path=model_path, bind_to_mesh=True,
            capacity=1024, n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False,
            sh_degree=3, eval=True,
        ),
        pipeline=PipelineConfig(use_pallas=False, **{k: v for k, v in TILE.items()
                                if k in ("tile_h", "tile_w")},
                                capacity_per_tile=TILE["capacity"],
                                max_tiles_per_gaussian=TILE["max_tiles_per_gaussian"]),
    )
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        f.write(to_json(cfg))
    from gaussianavatars_tpu.models.flame.assets import save_assets

    save_assets(flame_model.assets, os.path.join(model_path, "flame_assets.npz"))
    scene = Scene(str(root), model_path=model_path, num_verts_hint=flame_model.num_verts)
    scene.save(777, params, aux, flame_param=scene.flame_table)
    return model_path


def test_lpips_properties():
    p = synthetic_lpips_params()
    k = jax.random.PRNGKey(0)
    a = jax.random.uniform(k, (64, 64, 3))
    b = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
    same = float(lpips(p, a, a))
    diff = float(lpips(p, a, b))
    assert abs(same) < 1e-6
    assert diff > 1e-4
    # small perturbation < big perturbation
    near = float(lpips(p, a, jnp.clip(a + 0.01, 0, 1)))
    assert near < diff
    g = jax.grad(lambda x: lpips(p, x, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_lpips_weight_roundtrip(tmp_path):
    from gaussianavatars_tpu.metrics import load_lpips_weights
    from gaussianavatars_tpu.metrics.lpips import VGG16_STAGES

    p = synthetic_lpips_params()
    out = {}
    for i, (w, b) in enumerate(zip(p.conv_w, p.conv_b)):
        out[f"conv_w_{i}"] = np.asarray(w)
        out[f"conv_b_{i}"] = np.asarray(b)
    for i, w in enumerate(p.lin_w):
        out[f"lin_w_{i}"] = np.asarray(w)
    np.savez(tmp_path / "w.npz", **out)
    p2 = load_lpips_weights(str(tmp_path / "w.npz"))
    img = jax.random.uniform(jax.random.PRNGKey(2), (32, 32, 3))
    img2 = jax.random.uniform(jax.random.PRNGKey(3), (32, 32, 3))
    assert float(lpips(p, img, img2)) == pytest.approx(float(lpips(p2, img, img2)), rel=1e-6)


def test_load_avatar(trained_model_dir, flame_model):
    it = find_latest_iteration(trained_model_dir)
    assert it == 777
    ply = checkpoint_ply_path(trained_model_dir, -1)
    params, aux, table = load_avatar(ply)
    n = int(np.asarray(aux.alive).sum())
    assert n == flame_model.num_faces
    assert table is not None and table["expr"].shape == (2, N_EXPR)
    assert params.sh_rest.shape[1] == 15
    # disable_fid hides those faces' Gaussians
    p2, a2, _ = load_avatar(ply, disable_fid=np.arange(10))
    assert int(np.asarray(a2.alive).sum()) == n - 10


def test_render_and_metrics_cli(trained_model_dir):
    import importlib

    render_mod = importlib.import_module("render")
    render_mod.main([
        "-m", trained_model_dir, "--skip_train", "--quiet", "--n_frames", "2",
    ])
    rdir = os.path.join(trained_model_dir, "val", "ours_777", "renders")
    gdir = os.path.join(trained_model_dir, "val", "ours_777", "gt")
    assert len(os.listdir(rdir)) == 2 and len(os.listdir(gdir)) == 2

    metrics_mod = importlib.import_module("metrics")
    metrics_mod.main(["-m", trained_model_dir, "--splits", "val", "test"])
    res = json.load(open(os.path.join(trained_model_dir, "results.json")))
    key = "val/ours_777"
    assert key in res and res[key]["psnr"] > 25  # same avatar → near-perfect
    assert res[key]["ssim"] > 0.9
