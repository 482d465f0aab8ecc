import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.models.flame import FlameConfig, FlameModel, synthetic_assets
from gaussianavatars_tpu.models.flame.flame_model import zero_params
from gaussianavatars_tpu.models.flame.lbs import (
    batch_rodrigues,
    batch_rigid_transform,
    blend_shapes,
    lbs,
    vertices2joints,
)
from gaussianavatars_tpu.models.binding import face_frames
from gaussianavatars_tpu.ops.quaternion import quat_to_rotmat


def small_model(add_teeth=False):
    assets = synthetic_assets(n_shape=10, n_expr=5, seed=0)
    return FlameModel(assets, FlameConfig(n_shape=10, n_expr=5, add_teeth=add_teeth))


def test_rodrigues_identity_and_known():
    R = batch_rodrigues(jnp.zeros((1, 3)))
    np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-6)
    # pi/2 about z
    R = batch_rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))
    np.testing.assert_allclose(
        R[0] @ jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]), atol=1e-5
    )


def test_blend_shapes_linear():
    V, L = 50, 4
    dirs = jax.random.normal(jax.random.PRNGKey(0), (V, 3, L))
    b = jnp.zeros((1, L)).at[0, 2].set(2.0)
    out = blend_shapes(b, dirs)
    np.testing.assert_allclose(out[0], 2.0 * dirs[:, :, 2], atol=1e-5)


def test_rest_pose_is_identity_transform():
    model = small_model()
    params = zero_params(10, 5, batch=1)
    verts = model.forward(params)
    # Zero pose, zero shape/expr → exactly the template.
    np.testing.assert_allclose(
        np.asarray(verts[0]), model.assets.v_template, atol=1e-5
    )


def test_global_rotation_rotates_all():
    model = small_model()
    params = zero_params(10, 5, batch=1)
    angle = jnp.array([[0.0, 0.0, np.pi / 2]])
    rotated = model.forward(params._replace(rotation=angle))
    R = np.asarray(batch_rodrigues(angle)[0])
    # Global joint is at j0; rotation is about the root joint position.
    d = model.d
    joints = np.asarray(vertices2joints(d["j_regressor"], model.d["v_template"][None]))[0]
    expect = (model.assets.v_template - joints[0]) @ R.T + joints[0]
    np.testing.assert_allclose(np.asarray(rotated[0]), expect, atol=1e-4)


def test_translation():
    model = small_model()
    params = zero_params(10, 5, batch=1)
    t = jnp.array([[0.1, -0.2, 0.3]])
    moved = model.forward(params._replace(translation=t))
    base = model.forward(params)
    np.testing.assert_allclose(np.asarray(moved - base), np.tile(t, (base.shape[1], 1))[None], atol=1e-5)


def test_jaw_moves_subset_only():
    model = small_model()
    params = zero_params(10, 5, batch=1)
    base = model.forward(params)
    jaw = model.forward(params._replace(jaw=jnp.array([[0.3, 0.0, 0.0]])))
    d = np.linalg.norm(np.asarray(jaw - base)[0], axis=1)
    assert d.max() > 1e-4            # something moved
    # Synthetic skinning weights are smooth, not sparse — check the motion is
    # strongly non-uniform (jaw-weighted region moves much more than the top).
    assert d.min() < 0.1 * d.max()


def test_teeth_augmentation_counts():
    model = small_model(add_teeth=True)
    base = synthetic_assets(n_shape=10, n_expr=5, seed=0)
    assert model.num_verts == base.num_verts + 120
    assert model.num_faces == base.num_faces + 168
    assert model.assets.lbs_weights.shape[0] == model.num_verts
    assert model.assets.shapedirs.shape[0] == model.num_verts
    # Upper teeth ride the neck joint, lower ride the jaw.
    up = model.assets.vertex_masks["teeth_upper"]
    lo = model.assets.vertex_masks["teeth_lower"]
    assert np.allclose(model.assets.lbs_weights[up, 1], 1.0)
    assert np.allclose(model.assets.lbs_weights[lo, 2], 1.0)


def test_face_frames_orthonormal():
    model = small_model()
    params = zero_params(10, 5, batch=1)
    verts = model.forward(params)
    fr = face_frames(verts[0], model.faces)
    R = np.asarray(fr.orien_mat)
    eye = np.eye(3)[None]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(eye, (R.shape[0], 1, 1)), atol=1e-4)
    dets = np.linalg.det(R)
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    # Quaternion matches the matrix.
    Rq = np.asarray(quat_to_rotmat(fr.orien_quat))
    np.testing.assert_allclose(Rq, R, atol=1e-4)
    assert np.all(np.asarray(fr.scaling) > 0)


def test_flame_grads_flow():
    model = small_model()
    params = zero_params(10, 5, batch=1)

    def f(jaw):
        verts = model.forward(params._replace(jaw=jaw))
        return jnp.sum(verts**2)

    g = jax.grad(f)(jnp.full((1, 3), 0.1))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_laplacian_loss_zero_for_identical():
    model = small_model()
    params = zero_params(10, 5, batch=1)
    verts = model.forward(params)
    assert float(model.laplacian_loss(verts, verts)) == 0.0
    moved = verts.at[:, ::7].add(0.01)
    assert float(model.laplacian_loss(moved, verts)) > 0


def test_full_custom_region_set():
    """The reference FlameMask's ~20 custom regions ship complete
    (`flame_model/flame.py:641-815` — extracted topology data)."""
    import numpy as np

    from gaussianavatars_tpu.models.flame.regions import (
        CUSTOM_REGIONS, derived_regions,
    )
    from gaussianavatars_tpu.models.flame.topology import builtin_vertex_masks

    expected_sizes = {
        "neck_top": 34, "lip_inside_ring_upper": 15, "lip_inside_ring_lower": 15,
        "lip_outside_ring_upper": 15, "lip_outside_ring_lower": 15,
        "lip_inside_upper": 51, "lip_inside_lower": 45, "lip_inside": 128,
        "neck_upper": 149, "neck_lower": 130, "neck_base": 21, "bottomline": 30,
        "left_iris": 97, "right_iris": 97, "left_eyelid": 146,
        "right_eyelid": 146, "lips_tight": 214, "left_half": 2569,
        "right_half": 2569,
    }
    for name, size in expected_sizes.items():
        assert name in CUSTOM_REGIONS, name
        assert CUSTOM_REGIONS[name].shape == (size,), name
        assert CUSTOM_REGIONS[name].max() < 5023
    # Spot-check membership against the reference tables.
    assert CUSTOM_REGIONS["neck_left_point"][0] == 3193
    assert CUSTOM_REGIONS["neck_right_point"][0] == 3296
    assert CUSTOM_REGIONS["left_eyelid"][0] == 807
    assert CUSTOM_REGIONS["lips_tight"][-1] == 3549
    d = derived_regions(CUSTOM_REGIONS)
    assert d["irises"].shape == (194,)
    assert d["eyelids"].shape == (292,)
    assert d["lip_inside_ring"].shape == (32,)
    assert 1594 in d["lip_inside_ring"] and 2730 in d["lip_inside_ring"]
    # And they all surface through the assets' mask table.
    masks = builtin_vertex_masks()
    for name in list(expected_sizes) + ["irises", "eyelids", "lip_inside_ring"]:
        assert name in masks, name
    # halves cover every FLAME vertex between them
    both = np.union1d(masks["left_half"], masks["right_half"])
    assert both.size >= 5023 - 100  # shared midline counted once


def test_fid_except_region_filtering():
    """`disable_fid`-style filtering parity
    (`scene/flame_gaussian_model.py:255-268`)."""
    import numpy as np

    model = small_model()
    all_f = np.arange(model.num_faces)
    sel = model.fid_by_region(["mouth"], min_verts=1)
    rest = model.fid_except_region(["mouth"])
    assert np.array_equal(np.union1d(sel, rest), all_f)
    assert np.intersect1d(sel, rest).size == 0
