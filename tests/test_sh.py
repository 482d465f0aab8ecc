import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianavatars_tpu.ops.sh import (
    eval_sh,
    eval_sh_color,
    num_sh_coeffs,
    rgb_to_sh0,
    sh0_to_rgb,
    sh_basis,
)


def _ref_eval_sh(deg, sh, dirs):
    """Scalar-form reference evaluation (PlenOctree constants)."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return result


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_matches_scalar_reference(deg):
    key = jax.random.PRNGKey(deg)
    n, k = 64, num_sh_coeffs(3)
    sh = jax.random.normal(key, (n, 3, k))
    dirs = jax.random.normal(jax.random.PRNGKey(deg + 10), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ours = eval_sh(sh, dirs, deg)
    ref = _ref_eval_sh(deg, np.asarray(sh), np.asarray(dirs))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_basis_shapes():
    dirs = jnp.ones((5, 3)) / np.sqrt(3)
    for deg in range(4):
        assert sh_basis(dirs, deg).shape == (5, num_sh_coeffs(deg))


def test_dc_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh0_to_rgb(rgb_to_sh0(rgb)), rgb, atol=1e-6)


def test_color_clamped_nonnegative():
    sh = -10.0 * jnp.ones((4, 3, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    out = eval_sh_color(sh, dirs, 0)
    assert np.all(np.asarray(out) >= 0.0)


def test_degree4_orthonormal():
    """Degree-4 rows validated against the defining property of the real SH
    basis: orthonormality over the sphere, ∫ Y_i·Y_j dΩ = δ_ij. Exact
    Gauss-Legendre × trapezoidal quadrature (products are degree-8
    polynomials in cosθ and trig polynomials of order ≤ 8 in φ)."""
    nodes, weights = np.polynomial.legendre.leggauss(16)   # cosθ
    n_phi = 32
    phi = np.arange(n_phi) * (2 * np.pi / n_phi)
    ct, ph = np.meshgrid(nodes, phi, indexing="ij")
    st = np.sqrt(1.0 - ct * ct)
    dirs = np.stack([st * np.cos(ph), st * np.sin(ph), ct], axis=-1)
    B = np.asarray(sh_basis(jnp.asarray(dirs.reshape(-1, 3)), 4))
    B = B.reshape(16, n_phi, 25)
    w = weights[:, None] * (2 * np.pi / n_phi)
    gram = np.einsum("tpi,tpj,tp->ij", B, B, w)
    np.testing.assert_allclose(gram, np.eye(25), atol=1e-5)


def test_degree4_eval_consumes_25_coeffs():
    key = jax.random.PRNGKey(4)
    sh = jax.random.normal(key, (8, 3, 25))
    dirs = jax.random.normal(jax.random.PRNGKey(14), (8, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    full = eval_sh(sh, dirs, 4)
    # Degree-4 rows genuinely contribute.
    assert np.abs(np.asarray(full - eval_sh(sh[..., :16], dirs, 3))).max() > 1e-3
    # Zeroing rows 16..24 reduces exactly to the degree-3 evaluation.
    sh_z = sh.at[..., 16:].set(0.0)
    np.testing.assert_allclose(eval_sh(sh_z, dirs, 4), eval_sh(sh, dirs, 3), atol=1e-6)
