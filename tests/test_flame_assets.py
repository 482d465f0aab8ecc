"""FLAME asset conversion (pickle → npz) and save/load roundtrip."""
import os
import pickle

import numpy as np
import pytest

from fixtures_avatar import tiny_sphere_obj
from gaussianavatars_tpu.models.flame.assets import (
    convert_flame_pickle, load_assets, save_assets, synthetic_assets,
)


@pytest.fixture()
def fake_flame_pickle(tmp_path):
    """A FLAME-2023-shaped pickle (dict form) on a tiny mesh."""
    obj = str(tmp_path / "template.obj")
    tiny_sphere_obj(obj)
    from gaussianavatars_tpu.models.flame.obj_io import load_obj

    verts, uvs, faces, faces_uv = load_obj(obj)
    v = verts.shape[0]
    rng = np.random.default_rng(0)
    model = {
        "v_template": verts.astype(np.float64),
        # FLAME pickles store 300 shape + 100 expr concatenated on dim 2.
        "shapedirs": rng.normal(size=(v, 3, 400)).astype(np.float64) * 1e-3,
        "posedirs": rng.normal(size=(v, 3, 36)).astype(np.float64) * 1e-4,
        "J_regressor": np.abs(rng.normal(size=(5, v))).astype(np.float64),
        "kintree_table": np.array([[4294967295, 0, 1, 1, 1], [0, 1, 2, 3, 4]]),
        "weights": np.abs(rng.normal(size=(v, 5))).astype(np.float64),
        "f": faces,
    }
    model["J_regressor"] /= model["J_regressor"].sum(1, keepdims=True)
    pkl = str(tmp_path / "flame2023.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(model, f)
    # Landmark embedding file (npy dict) like the reference asset.
    emb = {
        "full_lmk_faces_idx": rng.integers(0, faces.shape[0], size=(1, 70)),
        "full_lmk_bary_coords": rng.dirichlet(np.ones(3), size=(1, 70)),
    }
    lmk = str(tmp_path / "landmark_embedding.npy")
    np.save(lmk, emb, allow_pickle=True)
    # Masks pickle.
    masks = {"face": np.arange(0, 50), "left_eyeball": np.arange(50, 60)}
    masks_pkl = str(tmp_path / "FLAME_masks.pkl")
    with open(masks_pkl, "wb") as f:
        pickle.dump(masks, f)
    return pkl, obj, lmk, masks_pkl, v, faces.shape[0]


def test_convert_flame_pickle(fake_flame_pickle, tmp_path):
    pkl, obj, lmk, masks_pkl, v, f = fake_flame_pickle
    out = convert_flame_pickle(
        pkl, obj, str(tmp_path / "flame.npz"),
        masks_pkl=masks_pkl, lmk_embedding_npy=lmk,
        n_shape=30, n_expr=20,
    )
    assets = load_assets(out)
    assert assets.v_template.shape == (v, 3)
    assert assets.shapedirs.shape == (v, 3, 50)
    assert assets.n_shape == 30
    assert assets.posedirs.shape == (36, v * 3)
    assert assets.j_regressor.shape == (5, v)
    assert assets.parents[0] == -1 and (assets.parents[1:] == [0, 1, 1, 1]).all()
    assert assets.lmk_faces_idx.shape == (70,)
    assert "face" in assets.vertex_masks
    # The converted model drives the full FLAME forward.
    import jax.numpy as jnp

    from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel
    from gaussianavatars_tpu.models.flame.flame_model import zero_params

    model = FlameModel(assets, FlameConfig(n_shape=30, n_expr=20, add_teeth=False))
    fl = zero_params(30, 20, batch=1)
    verts0 = model.forward(fl)
    verts1 = model.forward(fl._replace(jaw=jnp.full((1, 3), 0.2)))
    assert verts0.shape == (1, v, 3)
    assert float(jnp.abs(verts1 - verts0).max()) > 1e-4  # jaw articulates


def test_save_load_assets_roundtrip(tmp_path):
    obj = str(tmp_path / "t.obj")
    tiny_sphere_obj(obj)
    a = synthetic_assets(n_shape=4, n_expr=3, seed=1, template_obj=obj)
    save_assets(a, str(tmp_path / "a.npz"))
    b = load_assets(str(tmp_path / "a.npz"))
    np.testing.assert_allclose(b.v_template, a.v_template)
    np.testing.assert_allclose(b.shapedirs, a.shapedirs)
    np.testing.assert_allclose(b.lbs_weights, a.lbs_weights)
    assert b.n_shape == a.n_shape
    assert set(b.vertex_masks) == set(a.vertex_masks)
    for k in a.vertex_masks:
        np.testing.assert_array_equal(b.vertex_masks[k], a.vertex_masks[k])
