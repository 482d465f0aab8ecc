"""The training step: one jitted pure function over a TrainState pytree.

Functional re-design of the reference train loop body (`train.py:174-290`).
The step is split in two differentiable stages joined by an explicit
screen-space seam:

    geometry: (GaussianParams, FlameTrainable) → (mean2d, conic, colors, α)
    image:    screen-space inputs → rasterize → losses

so that ∂loss/∂mean2d — which the reference recovers through the
`screenspace_points.grad` side channel (`gaussian_renderer/__init__.py:26-31`)
— is a first-class value here: it feeds the densification statistics, and is
then chained through the geometry VJP into the parameter gradients. Binding
regularisers (xyz/scale/laplacian), the five innovations, per-group Adam with
the exponential xyz schedule, and SH warm-up all live inside the same jit.

Densify/prune/opacity-reset are separate jitted events driven by the host
loop (`models/densify.py`) — same cadence as the reference
(`train.py:264-277`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.cameras import Camera
from ..models.binding import face_frames
from ..models.densify import add_densification_stats
from ..models.flame.flame_model import FlameModel, FlameParams
from ..models.gaussians import GaussianAux, GaussianParams, world_gaussians
from ..ops.projection import project_from_params
from ..ops.rasterize_tiled import TileConfig, bin_gaussians, rasterize_binned, composite_tiles
from ..ops.sh import eval_sh_color_kc
from .innovations import (
    ColorNetParams,
    ContrastiveCache,
    color_net_apply,
    color_net_init,
    color_net_reg,
    contrastive_init,
    contrastive_loss,
    contrastive_update,
    flame_region_weight_map,
    heuristic_weight_map,
)
from .loss import l1_loss, psnr, safe_norm, ssim, weighted_l1_loss
from .optim import AdamState, adam_init, adam_update, expon_lr


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlameTrainable:
    """Per-timestep FLAME parameters under optimisation
    (`FlameGaussianModel.training_setup`, `scene/flame_gaussian_model.py:173-216`)."""

    expr: jnp.ndarray         # [T, E]
    rotation: jnp.ndarray     # [T, 3]
    neck: jnp.ndarray         # [T, 3]
    jaw: jnp.ndarray          # [T, 3]
    eyes: jnp.ndarray         # [T, 6]
    translation: jnp.ndarray  # [T, 3]
    # Per-timestep vertex offsets ([T, V, 3]); carried for the
    # lambda_dynamic_offset / lambda_dynamic_offset_std regularisers.
    # Matches the reference, where the buffer exists but is NOT an optimiser
    # param group (`scene/flame_gaussian_model.py:213-216` is commented out)
    # — `flame_lr_tree` gives it lr 0, so it only changes if loaded from data.
    dynamic_offset: Optional[jnp.ndarray] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlameStatic:
    shape: jnp.ndarray                      # [S]
    static_offset: Optional[jnp.ndarray]    # [V, 3] or None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: GaussianParams
    aux: GaussianAux
    adam: AdamState
    flame: Optional[FlameTrainable]
    flame_static: Optional[FlameStatic]
    flame_adam: Optional[AdamState]
    color_net: Optional[ColorNetParams]
    color_adam: Optional[AdamState]
    contrastive: Optional[ContrastiveCache]
    key: jax.Array


def init_train_state(
    params: GaussianParams,
    aux: GaussianAux,
    cfg: Config,
    num_timesteps: int = 0,
    n_expr: int = 100,
    n_shape: int = 300,
    num_verts: int = 0,
    key: Optional[jax.Array] = None,
    image_hw: Optional[tuple[int, int]] = None,
    flame_init: Optional[dict] = None,
) -> TrainState:
    key = key if key is not None else jax.random.PRNGKey(0)
    flame = flame_static = flame_adam = None
    if num_timesteps > 0:
        t = num_timesteps
        fi = flame_init or {}
        # Allocate the [T, V, 3] dynamic-offset buffer only when it can
        # matter (provided by the dataset, or a consuming lambda is active) —
        # it is 3·T·V floats of dead weight otherwise.
        dyn = fi.get("dynamic_offset")
        if dyn is None and num_verts > 0 and (
            cfg.opt.lambda_dynamic_offset != 0
            or cfg.opt.lambda_dynamic_offset_std != 0
        ):
            dyn = jnp.zeros((t, num_verts, 3))
        flame = FlameTrainable(
            expr=jnp.asarray(fi.get("expr", jnp.zeros((t, n_expr)))),
            rotation=jnp.asarray(fi.get("rotation", jnp.zeros((t, 3)))),
            neck=jnp.asarray(fi.get("neck", jnp.zeros((t, 3)))),
            jaw=jnp.asarray(fi.get("jaw", jnp.zeros((t, 3)))),
            eyes=jnp.asarray(fi.get("eyes", jnp.zeros((t, 6)))),
            translation=jnp.asarray(fi.get("translation", jnp.zeros((t, 3)))),
            dynamic_offset=None if dyn is None else jnp.asarray(dyn),
        )
        flame_static = FlameStatic(
            shape=jnp.asarray(fi.get("shape", jnp.zeros((n_shape,)))),
            static_offset=(
                jnp.asarray(fi["static_offset"]) if "static_offset" in (fi or {}) else
                (jnp.zeros((num_verts, 3)) if num_verts else None)
            ),
        )
        flame_adam = adam_init(flame)
    color_net = color_adam = None
    if cfg.opt.use_color_calibration:
        key, k = jax.random.split(key)
        color_net = color_net_init(k, cfg.opt.color_net_hidden_dim, cfg.opt.color_net_layers)
        color_adam = adam_init(color_net)
    contrastive = None
    if cfg.opt.use_contrastive_reg and image_hw is not None:
        contrastive = contrastive_init(
            cfg.opt.contrastive_cache_size, image_hw[0], image_hw[1],
            cfg.opt.contrastive_downsample,
        )
    state = TrainState(
        params=params, aux=aux, adam=adam_init(params),
        flame=flame, flame_static=flame_static, flame_adam=flame_adam,
        color_net=color_net, color_adam=color_adam, contrastive=contrastive,
        key=key,
    )

    # Strengthen weak-typed leaves (e.g. anything built by jnp.full with a
    # python float). A weak-typed input leaf becomes strong after one train
    # step, which changes the jit cache key and silently RECOMPILES every
    # jitted step on its second call (~40 s on the tunnel TPU).
    def _strengthen(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number):
            return jnp.asarray(x).astype(x.dtype)
        return x

    return jax.tree_util.tree_map(_strengthen, state)


def gaussian_lr_tree(params: GaussianParams, step, cfg: Config, spatial_lr_scale: float):
    """Per-leaf learning rates (`training_setup`, `scene/gaussian_model.py:214-232`)."""
    o = cfg.opt
    pos_lr = expon_lr(
        step,
        o.position_lr_init * spatial_lr_scale,
        o.position_lr_final * spatial_lr_scale,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.position_lr_max_steps,
    )
    return GaussianParams(
        means=pos_lr,
        log_scales=o.scaling_lr,
        quats=o.rotation_lr,
        sh_dc=o.feature_lr,
        sh_rest=o.feature_lr / 20.0,
        logit_opacity=o.opacity_lr,
    )


def flame_lr_tree(cfg: Config, flame: Optional[FlameTrainable] = None) -> FlameTrainable:
    o = cfg.opt
    return FlameTrainable(
        expr=o.flame_expr_lr,
        rotation=o.flame_pose_lr,
        neck=o.flame_pose_lr,
        jaw=o.flame_pose_lr,
        eyes=o.flame_pose_lr,
        translation=o.flame_trans_lr,
        # Not optimised in the reference (param group commented out,
        # `scene/flame_gaussian_model.py:213-216`): lr 0 — gradients flow
        # (the reg terms are differentiable) but the buffer never moves.
        dynamic_offset=(
            None if flame is None or flame.dynamic_offset is None else 0.0
        ),
    )


class StepOutput(NamedTuple):
    state: TrainState
    metrics: dict
    image: jnp.ndarray


def make_train_step(
    model: Optional[FlameModel],
    cfg: Config,
    tile_cfg: TileConfig,
    spatial_lr_scale: float = 1.0,
    compositor=None,
    jit: bool = True,
):
    """Build the jitted train step (or the raw body with `jit=False`, used
    by `make_train_scan`).

    Static across calls: model topology, configs, tile geometry, image size
    (from the Camera's static fields), and sh_degree.
    """
    o = cfg.opt
    use_flame = model is not None
    faces = model.faces if use_flame else None
    # vid_by_region clips region tables (FLAME-5023 topology data) to the
    # model's vertex count — raw vertex_masks ids on a smaller synthetic
    # topology would clamp-gather to an arbitrary vertex under jit.
    region_vids = (
        {k: model.vid_by_region([k])
         for k in ("eyes_left", "eyes_right", "mouth", "nose")
         if k in model.assets.vertex_masks}
        if use_flame else {}
    )

    def train_step(
        state: TrainState,
        gt_image: jnp.ndarray,     # [H, W, 3]
        camera: Camera,
        timestep: jnp.ndarray,     # [] int32
        bg_color: jnp.ndarray,     # [3]
        sh_degree: int,
    ) -> StepOutput:
        H, W = camera.height, camera.width
        key, key_next = jax.random.split(state.key)

        # ------------------------------------------------ stage 1: geometry
        # The binding regularisers (xyz/scale) and the FLAME laplacian are
        # computed INSIDE this stage so their gradients ride the same VJP as
        # the screen-space seam — one FLAME forward+backward per step instead
        # of a separate reg pass (the laplacian reuses verts/verts_cano).
        def geometry(params: GaussianParams, flame: Optional[FlameTrainable]):
            if use_flame:
                fp = FlameParams(
                    shape=state.flame_static.shape,
                    expr=flame.expr[timestep][None],
                    rotation=flame.rotation[timestep][None],
                    neck=flame.neck[timestep][None],
                    jaw=flame.jaw[timestep][None],
                    eyes=flame.eyes[timestep][None],
                    translation=flame.translation[timestep][None],
                    static_offset=state.flame_static.static_offset,
                    dynamic_offset=(
                        None if flame.dynamic_offset is None
                        else flame.dynamic_offset[timestep][None]
                    ),
                )
                verts, verts_cano = model.forward(fp, return_verts_cano=True)
                frames = face_frames(verts[0], faces)
            else:
                verts = verts_cano = None
                frames = None
            wg = world_gaussians(params, state.aux, frames)
            proj = project_from_params(
                wg.means, wg.scales, wg.quats, camera, alive=wg.alive
            )
            dirs = wg.means - camera.camera_center
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
            colors = eval_sh_color_kc(wg.sh, dirs, sh_degree)
            opac_eff = jnp.where(proj.mask, wg.opacity, 0.0)
            screen = (proj.mean2d, proj.conic, colors, opac_eff)

            # Regularisers (`train.py:229-243` binding losses).
            reg_terms = {}
            visible = jax.lax.stop_gradient(proj.radius > 0)
            nvis = jnp.maximum(jnp.sum(visible), 1)
            if use_flame:
                # face_scaling per Gaussian, for the metric-unit variants
                # (reference `train.py:213-222`).
                fs = frames.scaling[state.aux.binding]        # [N, 1]
                if o.metric_xyz:
                    # metric units: relu elementwise on (xyz·s − τ), THEN the
                    # row norm — the reference's exact structure.
                    xyz_excess = safe_norm(
                        jax.nn.relu(params.means * fs - o.threshold_xyz), axis=1
                    )
                else:
                    xyz_excess = jax.nn.relu(
                        safe_norm(params.means, axis=1) - o.threshold_xyz
                    )
                reg_terms["xyz"] = (
                    jnp.sum(jnp.where(visible, xyz_excess, 0.0)) / nvis * o.lambda_xyz
                )
                if o.lambda_scale != 0:
                    scale_val = jnp.exp(params.log_scales)
                    if o.metric_scale:
                        scale_val = scale_val * fs            # get_scaling
                    sc_excess = jax.nn.relu(scale_val - o.threshold_scale)
                    sc_norm = safe_norm(sc_excess, axis=1)
                    reg_terms["scale"] = (
                        jnp.sum(jnp.where(visible, sc_norm, 0.0)) / nvis
                        * o.lambda_scale
                    )
                if flame.dynamic_offset is not None and o.lambda_dynamic_offset != 0:
                    # `compute_dynamic_offset_loss`
                    # (`scene/flame_gaussian_model.py:155-158`).
                    reg_terms["dy_off"] = (
                        safe_norm(flame.dynamic_offset[timestep], axis=-1).mean()
                        * o.lambda_dynamic_offset
                    )
                if (
                    flame.dynamic_offset is not None
                    and o.lambda_dynamic_offset_std != 0
                ):
                    # std over the time axis (Bessel-corrected, like
                    # torch.std), mean over verts/xyz (`train.py:228-229`).
                    reg_terms["dynamic_offset_std"] = (
                        jnp.std(flame.dynamic_offset, axis=0, ddof=1).mean()
                        * o.lambda_dynamic_offset_std
                    )
                if o.lambda_laplacian != 0:
                    reg_terms["lap"] = (
                        model.laplacian_loss(verts, verts_cano) * o.lambda_laplacian
                    )
            reg_total = (
                sum(reg_terms.values()) if reg_terms else jnp.zeros(())
            )
            return (screen, reg_total), (proj, verts, reg_terms)

        (screen, reg_total), vjp_geo, geo_aux = jax.vjp(
            geometry, state.params, state.flame, has_aux=True
        )
        proj, verts, reg_terms = geo_aux
        proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)
        use_sorted = (
            cfg.pipeline.use_sorted and cfg.pipeline.use_pallas
            and compositor is None
        )
        if use_sorted:
            pass  # binning happens inside image_loss (one custom-VJP seam)
        else:
            # Portable fallback: table binning + the lax.scan compositor
            # (or an explicit `compositor` override from tests).
            binned = bin_gaussians(
                proj_sg, H, W, tile_cfg,
                opacity=jax.lax.stop_gradient(screen[3]),
            )
            overflow = binned.overflow
            budget_overflow = binned.budget_overflow
            step_compositor = compositor or composite_tiles

        # ------------------------------------------------ stage 2: image loss
        def image_loss(screen, color_net):
            mean2d, conic, colors, opac = screen
            plan_metrics = None
            if use_sorted:
                from ..ops.rasterize_sorted import rasterize_sorted

                n = mean2d.shape[0]
                img, alpha, plan = rasterize_sorted(
                    proj_sg._replace(mean2d=mean2d, conic=conic),
                    colors, opac, H, W, bg_color,
                    tile_cfg.tile_h, tile_cfg.tile_w, tile_cfg.tier_spec(n),
                    amp=o.use_amp,
                )
                plan_metrics = (
                    jnp.zeros((), jnp.int32),       # no pair/tile capacity
                    plan.budget_overflow,
                    plan.max_footprint,
                )
            else:
                img, alpha = rasterize_binned(
                    mean2d, conic, colors, opac, binned, H, W, bg_color, tile_cfg,
                    compositor=step_compositor,
                )
            if color_net is not None:
                img = color_net_apply(color_net, img)
            losses = {}
            if o.use_region_adaptive_loss:
                if use_flame:
                    wmap = flame_region_weight_map(
                        jax.lax.stop_gradient(verts[0]), region_vids, camera, H, W,
                        o.region_weight_eyes, o.region_weight_mouth, o.region_weight_nose,
                    )
                else:
                    wmap = heuristic_weight_map(
                        H, W, o.region_weight_eyes, o.region_weight_mouth,
                        o.region_weight_nose, o.region_weight_face,
                    )
                losses["l1"] = weighted_l1_loss(img, gt_image, wmap[..., None]) * (
                    1.0 - o.lambda_dssim
                )
            else:
                losses["l1"] = l1_loss(img, gt_image) * (1.0 - o.lambda_dssim)
            chw = jnp.transpose(img, (2, 0, 1))
            gt_chw = jnp.transpose(gt_image, (2, 0, 1))
            losses["ssim"] = (1.0 - ssim(chw, gt_chw, amp=o.use_amp)) * o.lambda_dssim
            if color_net is not None and o.lambda_color_reg > 0:
                losses["color_reg"] = color_net_reg(color_net) * o.lambda_color_reg
            if state.contrastive is not None and o.lambda_contrastive > 0:
                losses["contrastive"] = (
                    contrastive_loss(state.contrastive, img, o.contrastive_downsample)
                    * o.lambda_contrastive
                )
            total = sum(losses.values())
            return total, (losses, img, plan_metrics)

        img_total, vjp_img, (loss_terms, img, plan_metrics) = jax.vjp(
            image_loss, screen, state.color_net, has_aux=True
        )
        if use_sorted:
            overflow, budget_overflow, max_footprint = plan_metrics
        else:
            max_footprint = jnp.zeros((), jnp.int32)
        g_screen, g_color = vjp_img(jnp.ones(()))
        # Screen-space mean gradients → densification statistics
        # (replaces the reference's viewspace_points.grad tap).
        aux_new = add_densification_stats(
            state.aux, g_screen[0], proj_sg.radius, W, H
        )

        # ------------------------------------------------ assemble gradients
        # One joint VJP: screen cotangents from the image loss, unit
        # cotangent on reg_total — image and regulariser gradients share the
        # FLAME/world-compose backward pass.
        g_params, g_flame = vjp_geo((g_screen, jnp.ones(())))
        if not use_flame:
            g_flame = None

        # ------------------------------------------------ optimiser updates
        lr_tree = gaussian_lr_tree(state.params, state.adam.step + 1, cfg, spatial_lr_scale)
        new_params, new_adam = adam_update(state.params, g_params, state.adam, lr_tree)
        new_flame, new_flame_adam = state.flame, state.flame_adam
        if use_flame:
            new_flame, new_flame_adam = adam_update(
                state.flame, g_flame, state.flame_adam,
                flame_lr_tree(cfg, state.flame),
            )
        new_color, new_color_adam = state.color_net, state.color_adam
        if state.color_net is not None:
            lr_c = jax.tree_util.tree_map(lambda _: o.color_net_lr, state.color_net)
            new_color, new_color_adam = adam_update(
                state.color_net, g_color, state.color_adam, lr_c
            )
        new_contrastive = state.contrastive
        if state.contrastive is not None:
            new_contrastive = contrastive_update(
                state.contrastive, img, o.contrastive_downsample
            )

        total = img_total + reg_total
        metrics = {
            "loss": total,
            "psnr": psnr(jax.lax.stop_gradient(img), gt_image),
            "num_visible": jnp.sum(proj_sg.radius > 0),
            "overflow": overflow,
            "budget_overflow": budget_overflow,
            "max_footprint": max_footprint,
            **{k: v for k, v in {**loss_terms, **reg_terms}.items()},
        }
        new_state = TrainState(
            params=new_params, aux=aux_new, adam=new_adam,
            flame=new_flame, flame_static=state.flame_static, flame_adam=new_flame_adam,
            color_net=new_color, color_adam=new_color_adam,
            contrastive=new_contrastive, key=key_next,
        )
        return StepOutput(state=new_state, metrics=metrics, image=img)

    if jit:
        return jax.jit(
            train_step, static_argnames=("sh_degree",), donate_argnums=(0,)
        )
    return train_step


def stack_cameras(cams):
    """Stack same-intrinsics Camera pytrees along a new leading axis (static
    fields must match; they are taken from the first camera).

    fov is static pytree aux-data, so rigs with per-camera intrinsics
    cannot be stacked — `train()` detects that case and falls back to
    single-step dispatch (the sharded driver traces per-view fovs instead,
    parallel/sharded.py `CameraBatch`)."""
    c0 = cams[0]
    for c in cams:
        assert (c.width, c.height) == (c0.width, c0.height), "mixed resolutions"
        assert (c.fovx, c.fovy) == (c0.fovx, c0.fovy), (
            "mixed per-camera intrinsics cannot ride one scan trace "
            "(fov is static metadata)"
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def make_train_scan(
    model: Optional[FlameModel],
    cfg: Config,
    tile_cfg: TileConfig,
    spatial_lr_scale: float = 1.0,
):
    """K train steps per dispatch via `lax.scan` — amortises host/tunnel
    per-call overhead (the reference pays one CUDA launch sequence per
    iteration; here one XLA program runs a whole chunk).

    Call: scan_fn(state, gt_cache [V,H,W,3] (uint8 or float, device
    resident), views [K] int32, cams (stacked Camera), timesteps [K],
    bg [3], sh_degree) → (state, metrics dict of [K] arrays).

    Ground truth is indexed *inside* the body from the resident cache
    rather than passed as a stacked [K,H,W,3] scan input: big image xs make
    the axon TPU backend pathologically slow (measured 27 ms → 700+ ms per
    step, sometimes an outright backend error), while a per-step gather
    from the cache costs ~1 ms.
    """
    step = make_train_step(model, cfg, tile_cfg, spatial_lr_scale, jit=False)

    @functools.partial(jax.jit, static_argnames=("sh_degree",), donate_argnums=(0,))
    def scan_fn(state, gt_cache, views, cams, timesteps, bg, sh_degree):
        from ..data.pipeline import gt_to_float

        def body(st, xs):
            v, cam, ts = xs
            out = step(st, gt_to_float(gt_cache[v]), cam, ts, bg, sh_degree)
            return out.state, out.metrics

        new_state, metrics = jax.lax.scan(body, state, (views, cams, timesteps))
        return new_state, metrics

    return scan_fn


def active_sh_degree(iteration: int, max_degree: int = 3) -> int:
    """SH warm-up: one more band every 1000 iterations (`train.py:176-177`)."""
    return min(iteration // 1000, max_degree)
