import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.ops.projection import project_from_params
from gaussianavatars_tpu.ops.rasterize_dense import render_dense
from gaussianavatars_tpu.ops.sh import rgb_to_sh0


def make_scene(n=64, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.normal(k1, (n, 3)) * 0.3
    scales = jnp.abs(jax.random.normal(k2, (n, 3))) * 0.05 + 0.02
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = jax.nn.sigmoid(jax.random.normal(k4, (n,)))
    colors = jax.random.uniform(k5, (n, 3))
    return means, scales, quats, opacity, colors


def make_cam(width=64, height=64):
    return look_at_camera(eye=(0.0, 0.0, -2.5), fovy=0.8, width=width, height=height)


def test_projection_center_point():
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), 0.1)
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    p = project_from_params(means, scales, quats, cam)
    # A point at the look-at target lands at the image centre.
    np.testing.assert_allclose(
        p.mean2d[0], [(cam.width - 1) / 2, (cam.height - 1) / 2], atol=1e-3
    )
    assert p.mask[0] and p.radius[0] > 0
    np.testing.assert_allclose(p.depth[0], 2.5, atol=1e-5)


def test_projection_behind_camera_culled():
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, -5.0]])  # behind the eye at z=-2.5 looking +z
    p = project_from_params(means, jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]), cam)
    assert not bool(p.mask[0])
    assert int(p.radius[0]) == 0


def test_projection_isotropic_radius():
    # An isotropic Gaussian of scale s at depth d has screen sigma ≈ f*s/d.
    cam = make_cam(128, 128)
    s = 0.05
    p = project_from_params(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.full((1, 3), s), jnp.array([[1.0, 0, 0, 0]]), cam
    )
    sigma_px = cam.focal_x * s / 2.5
    expected = np.ceil(3 * np.sqrt(sigma_px**2 + 0.3))
    assert abs(int(p.radius[0]) - expected) <= 1


def test_dense_render_background_only():
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(4)
    bg = jnp.array([0.1, 0.2, 0.3])
    out = render_dense(
        means + 100.0, scales, quats, opacity, cam, bg, colors=colors
    )  # everything off-screen
    np.testing.assert_allclose(out.color, jnp.broadcast_to(bg, out.color.shape), atol=1e-6)
    np.testing.assert_allclose(out.alpha, 0.0, atol=1e-6)


def test_dense_render_opaque_center():
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), 0.5)
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opacity = jnp.array([0.999])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    out = render_dense(means, scales, quats, opacity, cam, jnp.zeros(3), colors=colors)
    c = np.asarray(out.color[cam.height // 2, cam.width // 2])
    assert c[0] > 0.9 and c[1] < 0.05 and c[2] < 0.05


def test_dense_render_depth_order():
    # A red Gaussian in front of a green one: centre pixel must be red-dominant
    # regardless of array order.
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]])  # green behind, red in front
    scales = jnp.full((2, 3), 0.3)
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    opacity = jnp.array([0.9, 0.9])
    colors = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    out = render_dense(means, scales, quats, opacity, cam, jnp.zeros(3), colors=colors)
    c = np.asarray(out.color[cam.height // 2, cam.width // 2])
    assert c[0] > c[1] > 0.0


def test_dense_render_alpha_blend_value():
    # Single Gaussian with known alpha at its centre: out = a*c + (1-a)*bg.
    cam = make_cam()
    a0 = 0.6
    means = jnp.array([[0.0, 0.0, 0.0]])
    scales = jnp.full((1, 3), 1.0)  # huge → alpha ≈ opacity at centre
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opacity = jnp.array([a0])
    colors = jnp.array([[1.0, 1.0, 1.0]])
    bg = jnp.zeros(3)
    out = render_dense(means, scales, quats, opacity, cam, bg, colors=colors)
    c = float(out.color[cam.height // 2, cam.width // 2, 0])
    assert abs(c - a0) < 0.02


def test_dense_render_sh_path():
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(16)
    sh = jnp.zeros((16, 16, 3)).at[:, 0, :].set(rgb_to_sh0(colors))
    out_sh = render_dense(means, scales, quats, opacity, cam, jnp.zeros(3), sh=sh, sh_degree=0)
    out_c = render_dense(means, scales, quats, opacity, cam, jnp.zeros(3), colors=colors)
    np.testing.assert_allclose(out_sh.color, out_c.color, atol=1e-5)


def test_dense_render_grads_finite_and_nonzero():
    cam = make_cam(32, 32)
    means, scales, quats, opacity, colors = make_scene(32)

    def loss(means, scales, quats, opacity, colors):
        out = render_dense(means, scales, quats, opacity, cam, jnp.zeros(3), colors=colors)
        return jnp.mean(out.color**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, scales, quats, opacity, colors)
    total = 0.0
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
        total += float(jnp.sum(jnp.abs(g)))
    assert total > 0.0


def test_alive_mask_excludes_padding():
    cam = make_cam()
    means, scales, quats, opacity, colors = make_scene(32)
    alive = jnp.arange(32) < 16
    out_masked = render_dense(
        means, scales, quats, opacity, cam, jnp.zeros(3), colors=colors, alive=alive
    )
    out_trunc = render_dense(
        means[:16], scales[:16], quats[:16], opacity[:16], cam, jnp.zeros(3),
        colors=colors[:16],
    )
    np.testing.assert_allclose(out_masked.color, out_trunc.color, atol=1e-5)
