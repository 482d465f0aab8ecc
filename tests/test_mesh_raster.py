"""Mesh preview rasterizer: geometry, z-buffer, shading."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.ops.mesh_raster import (
    face_normals, rasterize_mesh, render_mesh_preview,
)


def _cam(w=64, h=48):
    return look_at_camera(eye=np.array([0.0, 0.0, -3.0]), fovy=0.8, width=w, height=h)


def test_single_triangle_coverage():
    cam = _cam()
    verts = jnp.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    vh = jnp.concatenate([verts, jnp.ones((3, 1))], -1)
    clip = vh @ cam.full_proj.T
    out = rasterize_mesh(clip, faces, cam.height, cam.width)
    frac = float(out.mask.mean())
    assert 0.05 < frac < 0.5
    # Winning barycentrics sum ≤ 1, non-negative where hit
    u, v = out.bary[..., 0], out.bary[..., 1]
    hit = np.asarray(out.mask)
    assert (np.asarray(u)[hit] >= -1e-4).all() and (np.asarray(v)[hit] >= -1e-4).all()
    assert ((np.asarray(u) + np.asarray(v))[hit] <= 1 + 1e-4).all()
    assert (np.asarray(out.face_id)[hit] == 0).all()


def test_zbuffer_orders_triangles():
    cam = _cam()
    # Triangle 0 behind (z=1), triangle 1 in front (z=0) overlapping center.
    verts = jnp.array([
        [-0.6, -0.6, 1.0], [0.6, -0.6, 1.0], [0.0, 0.7, 1.0],
        [-0.4, -0.4, 0.0], [0.4, -0.4, 0.0], [0.0, 0.5, 0.0],
    ])
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vh = jnp.concatenate([verts, jnp.ones((6, 1))], -1)
    out = rasterize_mesh(vh @ cam.full_proj.T, faces, cam.height, cam.width)
    ids = np.asarray(out.face_id)
    assert ids[cam.height // 2, cam.width // 2] == 1  # front triangle wins
    assert (ids == 0).any()  # back triangle visible at the fringe


def test_render_mesh_preview_sphere():
    from fixtures_avatar import make_flame_model
    import tempfile

    model = make_flame_model(tempfile.mkdtemp())
    verts = jnp.asarray(model.assets.v_template)
    center = np.asarray(verts.mean(0))
    extent = float(np.abs(np.asarray(verts) - center).max())
    cam = look_at_camera(eye=center + np.array([0.0, 0.0, -4 * extent]),
                         target=center, fovy=0.6, width=64, height=48)
    # antialias=1: this test checks hard shading invariants (unit normals);
    # AA edge blending is covered by test_antialias_fractional_edges.
    out = render_mesh_preview(verts, model.faces, cam, color=(0.8, 0.7, 0.6),
                              antialias=1)
    cover = float(out["rgba"][..., 3].mean())
    assert 0.1 < cover < 0.9
    # Front-lit shading varies across the sphere
    vis = np.asarray(out["diffuse"])[np.asarray(out["rgba"][..., 3]) > 0]
    assert vis.std() > 0.02
    # Normals are unit where hit
    nrm = np.asarray(out["normal"])[np.asarray(out["rgba"][..., 3]) > 0]
    assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-4)


def test_face_normals_unit():
    verts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
    n = face_normals(verts, jnp.array([[0, 1, 2]], jnp.int32))
    np.testing.assert_allclose(np.abs(np.asarray(n)), [[0, 0, 1]], atol=1e-6)


def test_chunking_invariance():
    cam = _cam(32, 32)
    key = jax.random.PRNGKey(0)
    verts = jax.random.normal(key, (30, 3)) * 0.5
    faces = jax.random.randint(key, (40, 3), 0, 30, jnp.int32)
    vh = jnp.concatenate([verts, jnp.ones((30, 1))], -1)
    clip = vh @ cam.full_proj.T
    o1 = rasterize_mesh(clip, faces, 32, 32, chunk=8)
    o2 = rasterize_mesh(clip, faces, 32, 32, chunk=64)
    np.testing.assert_array_equal(np.asarray(o1.face_id), np.asarray(o2.face_id))
    np.testing.assert_allclose(np.asarray(o1.bary), np.asarray(o2.bary), atol=1e-6)


def test_antialias_fractional_edges():
    """AA (the dr.antialias analogue) must produce fractional alpha on
    silhouette edges on BOTH sides, and not change interior pixels."""
    import jax.numpy as jnp
    import numpy as np

    from gaussianavatars_tpu.data.cameras import look_at_camera
    from gaussianavatars_tpu.ops.mesh_raster import render_mesh_preview

    # One triangle angled against the pixel grid.
    verts = jnp.asarray(np.array([
        [-0.61, -0.47, 0.0], [0.53, -0.31, 0.0], [0.07, 0.59, 0.0],
    ], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    cam = look_at_camera(eye=(0, 0, -2.0), fovy=0.9, width=64, height=48)

    hard = render_mesh_preview(verts, faces, cam, antialias=1)
    soft = render_mesh_preview(verts, faces, cam, antialias=2)
    a_hard = np.asarray(hard["rgba"][..., 3])
    a_soft = np.asarray(soft["rgba"][..., 3])
    assert a_soft.shape == a_hard.shape
    # Hard alpha is binary; AA alpha has fractional edge pixels.
    assert set(np.unique(a_hard)) <= {0.0, 1.0}
    frac = (a_soft > 0.05) & (a_soft < 0.95)
    assert frac.sum() > 10, frac.sum()
    # Interior/background bulk unchanged.
    assert abs(a_soft.sum() - a_hard.sum()) / max(a_hard.sum(), 1) < 0.15
    # Fractional pixels appear on the outside of the hard silhouette too.
    assert np.any(frac & (a_hard == 0.0))
    assert np.any(frac & (a_hard == 1.0))
