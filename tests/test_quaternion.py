import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.ops.quaternion import (
    covariance_from_scaling_rotation,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
)


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return quat_normalize(q)


def test_quat_to_rotmat_orthonormal():
    q = random_quats(jax.random.PRNGKey(0), 64)
    R = quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(64), atol=1e-5)


def test_identity_quat():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(quat_to_rotmat(q), jnp.eye(3), atol=1e-6)


def test_known_rotation_90z():
    # 90° about +z: (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    q = jnp.array([s, 0.0, 0.0, s])
    v = jnp.array([1.0, 0.0, 0.0])
    out = quat_rotate(q, v)
    np.testing.assert_allclose(out, jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_mul_matches_matmul():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a, b = random_quats(k1, 32), random_quats(k2, 32)
    Rab = quat_to_rotmat(quat_mul(a, b))
    np.testing.assert_allclose(Rab, quat_to_rotmat(a) @ quat_to_rotmat(b), atol=1e-5)


def test_rotmat_quat_roundtrip():
    q = random_quats(jax.random.PRNGKey(2), 128)
    q = jnp.where(q[:, :1] < 0, -q, q)  # canonical sign
    q2 = rotmat_to_quat(quat_to_rotmat(q))
    np.testing.assert_allclose(q2, q, atol=1e-4)


@pytest.mark.parametrize("angle", [0.0, np.pi - 1e-3, np.pi / 2])
def test_rotmat_quat_edge_angles(angle):
    # Rotation about x by `angle` — includes near-pi (w ≈ 0) branch.
    c, s = np.cos(angle), np.sin(angle)
    R = jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], jnp.float32)
    q = rotmat_to_quat(R)
    np.testing.assert_allclose(quat_to_rotmat(q), R, atol=1e-4)


def test_rotate_matches_rotmat():
    q = random_quats(jax.random.PRNGKey(3), 16)
    v = jax.random.normal(jax.random.PRNGKey(4), (16, 3))
    out = quat_rotate(q, v)
    ref = jnp.einsum("nij,nj->ni", quat_to_rotmat(q), v)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_covariance_psd_and_eigs():
    key = jax.random.PRNGKey(5)
    q = random_quats(key, 8)
    s = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (8, 3))) + 0.1
    cov = covariance_from_scaling_rotation(s, q)
    np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), atol=1e-6)
    eigs = np.linalg.eigvalsh(np.asarray(cov))
    np.testing.assert_allclose(np.sort(eigs, -1), np.sort(np.asarray(s) ** 2, -1), rtol=1e-4)


def test_grads_finite():
    def loss(q, s):
        return jnp.sum(covariance_from_scaling_rotation(s, q) ** 2)

    q = random_quats(jax.random.PRNGKey(7), 4)
    s = jnp.ones((4, 3)) * 0.5
    gq, gs = jax.grad(loss, argnums=(0, 1))(q, s)
    assert np.all(np.isfinite(gq)) and np.all(np.isfinite(gs))
