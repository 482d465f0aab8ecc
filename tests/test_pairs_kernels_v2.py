"""v2 backward pair kernel (fused contraction + 2-op chains): exact parity
with the v1 moments-replay kernel on the same binning, via the sorted-data
pipeline's gradients. Interpret mode on CPU (conftest)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.ops.rasterize_sorted import rasterize_sorted
from gaussianavatars_tpu.ops.sort_binning import TierSpec

from test_rasterize_pairs import H, W, make_scene, screen_inputs

SPEC = TierSpec(base=2, tiers=((512, 16),))


def forward_with_impl(impl, scene_seed=8):
    scene = make_scene(seed=scene_seed, opac_hi=0.999)
    proj, opac, colors, cam = screen_inputs(scene)
    bg = jnp.array([0.1, 0.5, 0.9])
    old = os.environ.get("GSAVATARS_PAIRS_FWD")
    os.environ["GSAVATARS_PAIRS_FWD"] = impl
    try:
        img, alpha, _plan = rasterize_sorted(
            proj, colors, opac, H, W, bg, 8, 16, SPEC
        )
        return np.asarray(img), np.asarray(alpha)
    finally:
        if old is None:
            os.environ.pop("GSAVATARS_PAIRS_FWD", None)
        else:
            os.environ["GSAVATARS_PAIRS_FWD"] = old


def test_fwd_v2_matches_v1():
    i1, a1 = forward_with_impl("v1")
    i2, a2 = forward_with_impl("v2")
    np.testing.assert_allclose(i2, i1, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(a2, a1, atol=1e-5, rtol=1e-5)


def test_fwd_v2_matches_v1_hot_tiles():
    # Saturating scene: early stop fires (the cond's crossing branch).
    from gaussianavatars_tpu.ops.projection import project_from_params
    scene = make_scene(n=400, seed=2, opac_lo=0.85, opac_hi=0.99)
    means, scales, quats, opacity, colors, cam = scene
    means = means.at[:, :2].multiply(0.05)
    proj = project_from_params(means, scales, quats, cam)
    opac = jnp.where(proj.mask, opacity, 0.0)
    bg = jnp.zeros(3)
    outs = {}
    for impl in ("v1", "v2"):
        os.environ["GSAVATARS_PAIRS_FWD"] = impl
        try:
            img, alpha, _ = rasterize_sorted(
                proj, colors, opac, H, W, bg, 8, 16, SPEC
            )
            outs[impl] = (np.asarray(img), np.asarray(alpha))
        finally:
            os.environ.pop("GSAVATARS_PAIRS_FWD", None)
    np.testing.assert_allclose(outs["v2"][0], outs["v1"][0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs["v2"][1], outs["v1"][1], atol=1e-5, rtol=1e-5)


def grads_with_impl(impl, scene_seed=7):
    scene = make_scene(seed=scene_seed, opac_hi=0.97)
    proj, opac, colors, cam = screen_inputs(scene)
    bg = jnp.array([0.3, 0.2, 0.1])
    wimg = jax.random.normal(jax.random.PRNGKey(3), (H, W, 3))
    walpha = jax.random.normal(jax.random.PRNGKey(4), (H, W))

    old = os.environ.get("GSAVATARS_PAIRS_BWD")
    os.environ["GSAVATARS_PAIRS_BWD"] = impl
    try:
        def loss(m2d, conic, col, op):
            p2 = proj._replace(mean2d=m2d, conic=conic)
            img, alpha, _plan = rasterize_sorted(
                p2, col, op, H, W, bg, 8, 16, SPEC
            )
            return jnp.sum(img * wimg) + jnp.sum(alpha * walpha)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(
            proj.mean2d, proj.conic, colors, opac
        )
    finally:
        if old is None:
            os.environ.pop("GSAVATARS_PAIRS_BWD", None)
        else:
            os.environ["GSAVATARS_PAIRS_BWD"] = old


def test_v2_matches_v1():
    g1 = grads_with_impl("v1")
    g2 = grads_with_impl("v2")
    for a, b, name in zip(g2, g1, ["mean2d", "conic", "color", "opac"]):
        # f32 reassociation only: the fused dot and the prefix-sum identity
        # reorder the same sums (same tolerance as the scan-reference
        # grad-parity tests, which both impls pass independently).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )
