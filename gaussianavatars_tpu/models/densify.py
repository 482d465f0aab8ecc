"""Adaptive density control as pure, static-shape functions.

The reference mutates optimizer internals in place and reallocates tensors at
every densify event (`scene/gaussian_model.py:340-541`). On TPU, shapes under
jit are static, so densification is re-designed as masked slot surgery on
fixed-capacity buffers:

  * clone: selected Gaussians are copied into free (dead) slots,
  * split: the parent slot is overwritten by child A and child B goes to a
    free slot (equivalent to the reference's append-2-then-prune-parent),
  * prune: the alive mask is cleared (bound mode protects faces that would
    lose their last Gaussian, same rule as `prune_points`,
    `scene/gaussian_model.py:377-404`),
  * Adam moments ride along functionally: new slots start with zero moments
    (what `cat_tensors_to_optimizer` does), pruned slots are zeroed on reuse.

Everything is jittable — no recompilation at densify events. If free slots run
out, requests are dropped and counted (`DensifyReport.dropped`); the host can
then call `grow_capacity` (one retrace) and proceed.

Faithful quirk: for bound Gaussians the reference samples split children with
*world* stds but places them in *triangle-local* coordinates
(`densify_and_split`, `scene/gaussian_model.py:467-471`); we reproduce this
exactly for recipe parity.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.quaternion import quat_normalize, quat_to_rotmat
from .gaussians import FaceFrames, GaussianAux, GaussianParams, inverse_sigmoid


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 0.0002
    percent_dense: float = 0.01
    min_opacity: float = 0.005
    max_screen_size: float = 20.0   # 0 disables the screen/world-size prunes
    split_factor: int = 2           # children per split (N in the reference)
    split_shrink: float = 0.8       # children scale = scale / (shrink · N)


class DensifyReport(NamedTuple):
    cloned: jnp.ndarray   # [] int32
    split: jnp.ndarray    # [] int32
    pruned: jnp.ndarray   # [] int32
    dropped: jnp.ndarray  # [] int32 requests lost to capacity exhaustion


def _free_slots(alive: jnp.ndarray) -> jnp.ndarray:
    cap = alive.shape[0]
    return jnp.nonzero(~alive, size=cap, fill_value=-1)[0].astype(jnp.int32)


def _requests(sel: jnp.ndarray) -> jnp.ndarray:
    cap = sel.shape[0]
    return jnp.nonzero(sel, size=cap, fill_value=-1)[0].astype(jnp.int32)


def _copy_rows(tree, src, dst_safe, valid, zero_new=False):
    """tree[dst] = tree[src] (or zeros) for valid pairs; drop the rest."""
    src_safe = jnp.where(valid, src, 0)

    def cp(x):
        rows = jnp.zeros_like(x[src_safe]) if zero_new else x[src_safe]
        return x.at[dst_safe].set(rows, mode="drop")

    return jax.tree_util.tree_map(cp, tree)


def world_scale_of(params: GaussianParams, aux: GaussianAux, frames: Optional[FaceFrames]):
    s = jnp.exp(params.log_scales)
    if frames is not None:
        s = s * frames.scaling[aux.binding]
    return s


def add_densification_stats(
    aux: GaussianAux,
    screen_grad: jnp.ndarray,  # [N, 2] dL/dmean2d in *pixels*
    radii: jnp.ndarray,
    width: int,
    height: int,
) -> GaussianAux:
    """Accumulate screen-space gradient norms for visible Gaussians.

    The CUDA rasterizer reports mean2D grads scaled by half the screen size
    (NDC-ish units) and the 0.0002 threshold is calibrated for that; we rescale
    our pixel-space grads identically (`train.py:265-266`,
    `add_densification_stats` `scene/gaussian_model.py:539-541`).
    """
    vis = radii > 0
    g = screen_grad * jnp.array([[width * 0.5, height * 0.5]], screen_grad.dtype)
    norm = jnp.linalg.norm(g, axis=-1)
    return dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum + jnp.where(vis, norm, 0.0),
        denom=aux.denom + vis.astype(aux.denom.dtype),
        max_radii2d=jnp.maximum(aux.max_radii2d, jnp.where(vis, radii.astype(jnp.float32), 0.0)),
    )


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    adam_mu: GaussianParams,
    adam_nu: GaussianParams,
    key: jax.Array,
    extent: float,
    cfg: DensifyConfig,
    frames: Optional[FaceFrames] = None,
    clone_threshold: Optional[jnp.ndarray] = None,
    split_threshold: Optional[jnp.ndarray] = None,
):
    """One densify+prune event. Returns (params, aux, mu, nu, report).

    `clone_threshold`/`split_threshold` may be per-Gaussian arrays (smart
    densification, innovation 2) — default is the scalar `cfg.grad_threshold`.
    """
    cap = params.capacity
    grads = jnp.where(aux.denom > 0, aux.grad_accum / jnp.maximum(aux.denom, 1.0), 0.0)
    grads = jnp.nan_to_num(grads)
    wscale = world_scale_of(params, aux, frames)
    max_wscale = jnp.max(wscale, axis=1)
    thr_c = cfg.grad_threshold if clone_threshold is None else clone_threshold
    thr_s = cfg.grad_threshold if split_threshold is None else split_threshold

    # ---------------- clone ----------------
    sel_clone = aux.alive & (grads >= thr_c) & (max_wscale <= cfg.percent_dense * extent)
    src = _requests(sel_clone)
    dst = _free_slots(aux.alive)
    valid = (src >= 0) & (dst >= 0)
    dst_safe = jnp.where(valid, dst, cap)
    params = _copy_rows(params, src, dst_safe, valid)
    adam_mu = _copy_rows(adam_mu, src, dst_safe, valid, zero_new=True)
    adam_nu = _copy_rows(adam_nu, src, dst_safe, valid, zero_new=True)
    new_alive = aux.alive.at[dst_safe].set(True, mode="drop")
    new_binding = aux.binding.at[dst_safe].set(
        aux.binding[jnp.where(valid, src, 0)], mode="drop"
    )
    aux = dataclasses.replace(aux, alive=new_alive, binding=new_binding)
    n_cloned = jnp.sum(valid.astype(jnp.int32))
    dropped = jnp.sum((src >= 0) & (dst < 0))

    # ---------------- split ----------------
    # Cloned slots have zero accumulated grads, so they are never re-split.
    sel_split = aux.alive & (grads >= thr_s) & (max_wscale > cfg.percent_dense * extent)
    src_s = _requests(sel_split)
    dst_s = _free_slots(aux.alive)
    valid_s = (src_s >= 0) & (dst_s >= 0)
    dst_s_safe = jnp.where(valid_s, dst_s, cap)
    src_s_safe = jnp.where(src_s >= 0, src_s, 0)

    # Two children sampled from the parent (reference quirk preserved: world
    # stds in local coordinates for bound mode).
    k1, k2 = jax.random.split(key)
    stds = world_scale_of(params, aux, frames)  # [cap, 3]
    R = quat_to_rotmat(quat_normalize(params.quats))
    samp_a = jax.random.normal(k1, (cap, 3)) * stds
    samp_b = jax.random.normal(k2, (cap, 3)) * stds
    child_a_means = jnp.einsum("nij,nj->ni", R, samp_a) + params.means
    child_b_means = jnp.einsum("nij,nj->ni", R, samp_b) + params.means
    shrink = jnp.log(cfg.split_shrink * cfg.split_factor)
    child_log_scales = params.log_scales - shrink

    # Child B → free slot (copy all fields from parent, then fix means/scales).
    params = _copy_rows(params, src_s, dst_s_safe, valid_s)
    adam_mu = _copy_rows(adam_mu, src_s, dst_s_safe, valid_s, zero_new=True)
    adam_nu = _copy_rows(adam_nu, src_s, dst_s_safe, valid_s, zero_new=True)
    params.means = params.means.at[dst_s_safe].set(child_b_means[src_s_safe], mode="drop")
    params.log_scales = params.log_scales.at[dst_s_safe].set(
        child_log_scales[src_s_safe], mode="drop"
    )
    aux = dataclasses.replace(
        aux,
        alive=aux.alive.at[dst_s_safe].set(True, mode="drop"),
        binding=aux.binding.at[dst_s_safe].set(aux.binding[src_s_safe], mode="drop"),
    )

    # Child A overwrites the parent slot in place (only where child B landed;
    # a parent whose child B was dropped keeps its original parameters).
    took = jnp.zeros((cap,), bool).at[jnp.where(valid_s, src_s, cap)].set(True, mode="drop")
    params.means = jnp.where(took[:, None], child_a_means, params.means)
    params.log_scales = jnp.where(took[:, None], child_log_scales, params.log_scales)
    # Parent slot moments reset (reference: children are fresh appends).
    adam_mu = jax.tree_util.tree_map(
        lambda m: jnp.where(took.reshape((cap,) + (1,) * (m.ndim - 1)), 0.0, m), adam_mu
    )
    adam_nu = jax.tree_util.tree_map(
        lambda m: jnp.where(took.reshape((cap,) + (1,) * (m.ndim - 1)), 0.0, m), adam_nu
    )
    n_split = jnp.sum(valid_s.astype(jnp.int32))
    dropped = dropped + jnp.sum((src_s >= 0) & (dst_s < 0))

    # ---------------- prune ----------------
    opacity = jax.nn.sigmoid(params.logit_opacity[:, 0])
    prune = opacity < cfg.min_opacity
    if cfg.max_screen_size > 0:
        wscale2 = world_scale_of(params, aux, frames)
        prune = prune | (aux.max_radii2d > cfg.max_screen_size)
        prune = prune | (jnp.max(wscale2, axis=1) > 0.1 * extent)
    prune = prune & aux.alive
    if frames is not None:
        # Keep faces populated: if a face would lose all its Gaussians, keep
        # all of that face's requested prunes (reference `prune_points`).
        f = frames.center.shape[0]
        cnt_alive = jnp.zeros((f,), jnp.int32).at[aux.binding].add(aux.alive.astype(jnp.int32))
        cnt_prune = jnp.zeros((f,), jnp.int32).at[aux.binding].add(prune.astype(jnp.int32))
        emptied = (cnt_alive - cnt_prune) <= 0
        prune = prune & ~emptied[aux.binding]
    n_pruned = jnp.sum(prune.astype(jnp.int32))
    aux = dataclasses.replace(
        aux,
        alive=aux.alive & ~prune,
        grad_accum=jnp.zeros_like(aux.grad_accum),
        denom=jnp.zeros_like(aux.denom),
        max_radii2d=jnp.zeros_like(aux.max_radii2d),
    )
    report = DensifyReport(cloned=n_cloned, split=n_split, pruned=n_pruned, dropped=dropped)
    return params, aux, adam_mu, adam_nu, report


def reset_opacity(params: GaussianParams, adam_mu, adam_nu, ceiling: float = 0.01):
    """Clamp opacity to ≤ `ceiling` and zero its Adam moments
    (`reset_opacity` + `replace_tensor_to_optimizer`,
    `scene/gaussian_model.py:283-286,340-353`)."""
    op = jax.nn.sigmoid(params.logit_opacity)
    new_logit = inverse_sigmoid(jnp.minimum(op, ceiling))
    params = dataclasses.replace(params, logit_opacity=new_logit)
    adam_mu = dataclasses.replace(adam_mu, logit_opacity=jnp.zeros_like(adam_mu.logit_opacity))
    adam_nu = dataclasses.replace(adam_nu, logit_opacity=jnp.zeros_like(adam_nu.logit_opacity))
    return params, adam_mu, adam_nu


def grow_capacity(params: GaussianParams, aux: GaussianAux, adam_mu, adam_nu, new_cap: int):
    """Pad all buffers to a larger capacity (host-side; triggers one retrace)."""
    old = params.capacity
    if new_cap <= old:
        return params, aux, adam_mu, adam_nu
    extra = new_cap - old

    def pad(x, fill=0):
        pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    params = jax.tree_util.tree_map(pad, params)
    adam_mu = jax.tree_util.tree_map(pad, adam_mu)
    adam_nu = jax.tree_util.tree_map(pad, adam_nu)
    aux = GaussianAux(
        alive=pad(aux.alive, False),
        binding=pad(aux.binding),
        grad_accum=pad(aux.grad_accum),
        denom=pad(aux.denom),
        max_radii2d=pad(aux.max_radii2d),
    )
    return params, aux, adam_mu, adam_nu
