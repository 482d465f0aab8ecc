import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.models.densify import (
    DensifyConfig,
    densify_and_prune,
    grow_capacity,
    reset_opacity,
)
from gaussianavatars_tpu.models.gaussians import (
    init_from_points,
    inverse_sigmoid,
    num_alive,
)
from gaussianavatars_tpu.training.optim import adam_init


def setup(n=20, cap=64):
    pts = np.random.RandomState(0).randn(n, 3).astype(np.float32) * 0.1
    cols = np.random.RandomState(1).rand(n, 3).astype(np.float32)
    params, aux = init_from_points(pts, cols, capacity=cap)
    adam = adam_init(params)
    return params, aux, adam.mu, adam.nu


def test_clone_small_high_grad():
    params, aux, mu, nu = setup()
    # Small scales (clone branch), high grads on gaussians 0..4.
    params.log_scales = jnp.full_like(params.log_scales, -5.0)
    aux = dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum.at[:5].set(1.0),
        denom=aux.denom.at[:].set(1.0),
    )
    cfg = DensifyConfig(grad_threshold=0.5, max_screen_size=0.0, min_opacity=0.0)
    p2, a2, mu2, nu2, rep = densify_and_prune(
        params, aux, mu, nu, jax.random.PRNGKey(0), extent=10.0, cfg=cfg
    )
    assert int(rep.cloned) == 5
    assert int(rep.split) == 0
    assert int(num_alive(a2)) == 25
    # Clones are copies of the originals.
    new_slots = np.nonzero(np.asarray(a2.alive) & ~np.asarray(aux.alive))[0]
    assert len(new_slots) == 5
    np.testing.assert_allclose(
        np.sort(np.asarray(p2.means[new_slots]), axis=0),
        np.sort(np.asarray(params.means[:5]), axis=0),
        atol=1e-6,
    )


def test_split_large_high_grad():
    params, aux, mu, nu = setup()
    params.log_scales = jnp.full_like(params.log_scales, 1.0)  # large → split
    mu.means = mu.means.at[:].set(7.0)  # moments must reset for split slots
    aux = dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum.at[:3].set(1.0),
        denom=aux.denom.at[:].set(1.0),
    )
    cfg = DensifyConfig(grad_threshold=0.5, max_screen_size=0.0, min_opacity=0.0)
    p2, a2, mu2, nu2, rep = densify_and_prune(
        params, aux, mu, nu, jax.random.PRNGKey(0), extent=1.0, cfg=cfg
    )
    assert int(rep.split) == 3
    assert int(num_alive(a2)) == 23
    # Children scales shrink by 1/(0.8·2).
    np.testing.assert_allclose(
        np.asarray(p2.log_scales[:3]), 1.0 - np.log(1.6), atol=1e-5
    )
    # Parent-slot Adam moments were reset.
    np.testing.assert_allclose(np.asarray(mu2.means[:3]), 0.0)


def test_prune_low_opacity():
    params, aux, mu, nu = setup()
    params.logit_opacity = params.logit_opacity.at[:7].set(inverse_sigmoid(0.001))
    cfg = DensifyConfig(grad_threshold=1e9, max_screen_size=0.0, min_opacity=0.005)
    p2, a2, *_, rep = densify_and_prune(
        params, aux, mu, nu, jax.random.PRNGKey(0), extent=1.0, cfg=cfg
    )
    assert int(rep.pruned) == 7
    assert int(num_alive(a2)) == 13


def test_capacity_exhaustion_reports_dropped():
    params, aux, mu, nu = setup(n=20, cap=22)
    params.log_scales = jnp.full_like(params.log_scales, -5.0)
    aux = dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum.at[:10].set(1.0),
        denom=aux.denom.at[:].set(1.0),
    )
    cfg = DensifyConfig(grad_threshold=0.5, max_screen_size=0.0, min_opacity=0.0)
    _, a2, *_, rep = densify_and_prune(
        params, aux, mu, nu, jax.random.PRNGKey(0), extent=10.0, cfg=cfg
    )
    assert int(rep.cloned) == 2
    assert int(rep.dropped) == 8
    assert int(num_alive(a2)) == 22


def test_stats_reset_after_event():
    params, aux, mu, nu = setup()
    aux = dataclasses.replace(aux, grad_accum=aux.grad_accum + 1.0, denom=aux.denom + 2.0)
    cfg = DensifyConfig(grad_threshold=1e9, max_screen_size=0.0, min_opacity=0.0)
    _, a2, *_ = densify_and_prune(
        params, aux, mu, nu, jax.random.PRNGKey(0), extent=1.0, cfg=cfg
    )
    assert float(jnp.sum(a2.grad_accum)) == 0.0
    assert float(jnp.sum(a2.denom)) == 0.0


def test_reset_opacity():
    params, aux, mu, nu = setup()
    params.logit_opacity = params.logit_opacity.at[:].set(inverse_sigmoid(0.9))
    mu.logit_opacity = mu.logit_opacity.at[:].set(3.0)
    p2, mu2, nu2 = reset_opacity(params, mu, nu)
    op = np.asarray(jax.nn.sigmoid(p2.logit_opacity))
    np.testing.assert_allclose(op, 0.01, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu2.logit_opacity), 0.0)


def test_grow_capacity():
    params, aux, mu, nu = setup(n=20, cap=32)
    p2, a2, mu2, nu2 = grow_capacity(params, aux, mu, nu, 64)
    assert p2.capacity == 64
    assert int(num_alive(a2)) == 20
    np.testing.assert_allclose(np.asarray(p2.means[:32]), np.asarray(params.means))
