"""Per-group Adam with functional state (pytree moments).

The reference uses one torch.optim.Adam with named param groups and eps=1e-15
(`scene/gaussian_model.py:214-232`) and surgically edits its moment tensors at
densify events. Here the moments are plain pytrees with the same structure as
the parameters — densify surgery is ordinary gather/scatter on them
(`models/densify.py`) and checkpointing is trivial.

Learning rates are a pytree matching the parameter structure (leaves may be
traced scalars, so the xyz exponential schedule can live inside jit).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

ADAM_EPS = 1e-15  # reference: Adam(l, lr=0.0, eps=1e-15)


class AdamState(NamedTuple):
    mu: Any
    nu: Any
    step: jnp.ndarray  # [] int32


def adam_init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = ADAM_EPS,
):
    """One Adam step. `lr_tree` must have the same treedef as `params`
    (leaves: scalar learning rates, possibly traced)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        mhat = m / c1
        vhat = v / c2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_lr = treedef.flatten_up_to(lr_tree)

    out = [upd(p, g, m, v, lr) for p, g, m, v, lr in
           zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, step=step)


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear LR decay with optional sine delay — the 3DGS xyz schedule
    (`utils/general_utils.py:29-62`). Works on traced or Python steps."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
    return delay * log_lerp
