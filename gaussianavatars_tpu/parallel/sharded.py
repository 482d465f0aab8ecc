"""Sharded training step over a ('data', 'tile') device mesh.

Design (SURVEY.md §2.5/§5 — the CP/ring-attention analogue for splatting):

  * Gaussian/FLAME parameters are **replicated**; the heavy axis is pixels.
  * Each device owns a contiguous band of image tile-rows. After (replicated)
    projection, it shifts screen coordinates into its band's frame, bins
    against its local tile grid, and composites only its rows — the
    O(N·pixels) compositing work is split `tile`-ways with zero
    communication.
  * The full image is `all_gather`ed over `tile` (an image is ~1-4 MB —
    negligible next to compositing) so global losses (SSIM windows cross band
    boundaries) are computed replicated; autodiff of the gather hands each
    device exactly its rows' pixel gradients back.
  * The `data` axis runs one camera per data-group; gradients and
    densification statistics are reduced over the mesh so the update is
    identical on every device (replicated-state invariant, asserted by
    tests/test_sharded.py against the single-chip step).

Collective bookkeeping (the part worth reading twice):
  * pixel/image gradients differ per tile-device → `psum` over 'tile';
  * regulariser gradients are computed from replicated state → identical on
    every tile-device → reduced over 'data' only (a tile-psum would
    overcount ×n_tile);
  * the image loss applies `pmean` over 'data' inside the loss, so its VJP
    already carries the 1/n_data factor and a plain `psum` over 'data'
    completes the batch average.

One camera per data-group per step keeps recipe parity with the reference
(batch = 1 camera, `train.py:116-124`); data>1 is a batched generalisation.

Gaussian-axis sharding (``gauss_shard=True``) makes the 'tile' axis dual-role:

  * **Geometry phase** — each device slices its 1/k band of the Gaussian
    capacity axis and runs world composition, EWA projection and SH→RGB on
    that slice only (the O(N) per-splat FLOPs shard k-ways).
  * One ``all_gather`` over 'tile' of the *compact screen-space attributes*
    (mean2d, conic, rgb, opacity, depth — 10 floats/splat vs 59 for raw
    params+SH) restores the full set in original order.
  * **Compositing phase** — the same device then bins/composites its row
    band as before. Both heavy phases are sharded k-ways with one gather
    between them; its transpose (`psum_scatter`) routes each device exactly
    its slice's cotangents back, so gradients and densification statistics
    are bit-identical to the replicated path (asserted in tests).

Why a gather and not explicit ring streaming: alpha compositing is
depth-order-dependent, so a ring pass over Gaussian shards would need a
k-way sorted merge per tile with full-capacity buffers — erasing the memory
win. XLA already lowers ``all_gather`` as a bidirectional ring over ICI, so
the gather IS the ring, with the sorted merge done once by the global
binning sort.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..data.cameras import Camera
from ..data.pipeline import gt_to_float
from ..models.binding import face_frames
from ..models.flame.flame_model import FlameModel, FlameParams
from ..models.gaussians import world_gaussians
from ..ops.projection import project_from_params
from ..ops.rasterize_tiled import TileConfig, bin_gaussians, rasterize_binned
from ..ops.sh import eval_sh_color_kc
from ..training.innovations import (
    color_net_apply,
    color_net_reg,
    contrastive_loss,
    contrastive_update,
    flame_region_weight_map,
    heuristic_weight_map,
)
from ..training.loss import l1_loss, psnr, safe_norm, ssim, weighted_l1_loss
from ..training.optim import adam_update
from ..training.trainer import (
    TrainState,
    flame_lr_tree,
    gaussian_lr_tree,
)


class CameraBatch(NamedTuple):
    """Per-view tensors for B cameras (image SIZE is shared/static; fovs are
    traced so rigs with per-camera intrinsics project correctly)."""

    world_view: jnp.ndarray     # [B, 4, 4]
    proj: jnp.ndarray           # [B, 4, 4]
    full_proj: jnp.ndarray      # [B, 4, 4]
    camera_center: jnp.ndarray  # [B, 3]
    timestep: jnp.ndarray       # [B] int32
    tan_half_fovx: jnp.ndarray  # [B] f32
    tan_half_fovy: jnp.ndarray  # [B] f32


def camera_batch(cams: list[Camera]) -> CameraBatch:
    stack = lambda f: jnp.stack([getattr(c, f) for c in cams])
    return CameraBatch(
        world_view=stack("world_view"),
        proj=stack("proj"),
        full_proj=stack("full_proj"),
        camera_center=stack("camera_center"),
        timestep=jnp.asarray([c.timestep for c in cams], jnp.int32),
        tan_half_fovx=jnp.asarray([c.tan_half_fovx for c in cams], jnp.float32),
        tan_half_fovy=jnp.asarray([c.tan_half_fovy for c in cams], jnp.float32),
    )


@dataclasses.dataclass(frozen=True)
class _DeviceCamera:
    """In-trace camera shim: same attribute surface `projection.py` reads,
    but with traced per-view fov/focal scalars (a real `Camera` keeps fov as
    static python metadata, which would bake one rig's intrinsics into the
    trace). Constructed inside `device_fn` only — never crosses a jit
    boundary, so it need not be a pytree."""

    world_view: jnp.ndarray
    proj: jnp.ndarray
    full_proj: jnp.ndarray
    camera_center: jnp.ndarray
    tan_half_fovx: jnp.ndarray
    tan_half_fovy: jnp.ndarray
    width: int
    height: int

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_half_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_half_fovy)


def padded_height(height: int, tile_h: int, n_tile_shards: int) -> int:
    unit = tile_h * n_tile_shards
    return -(-height // unit) * unit


def pad_gt_for_mesh(gt: jnp.ndarray, height_pad: int) -> jnp.ndarray:
    """Pad [B, H, W, 3] ground truth rows to the mesh-divisible height."""
    b, h, w, c = gt.shape
    if h == height_pad:
        return gt
    return jnp.pad(gt, ((0, 0), (0, height_pad - h), (0, 0), (0, 0)))


def make_sharded_train_step(
    model: Optional[FlameModel],
    cfg: Config,
    tile_cfg: TileConfig,
    mesh: Mesh,
    template_camera: Camera,
    spatial_lr_scale: float = 1.0,
    gauss_shard: bool = False,
):
    """Build the jitted sharded train step.

    Call: step(state, cams: CameraBatch, gt [B, H_pad, W, 3], bg [3],
    sh_degree=...). State is replicated; cams/gt sharded over ('data',) and
    ('data','tile') respectively. Returns (state, metrics).

    With ``gauss_shard`` the per-Gaussian geometry work (world composition,
    projection, SH) is additionally sharded over 'tile' (see module
    docstring); requires capacity % n_tile == 0.
    """
    o = cfg.opt
    use_flame = model is not None
    faces = model.faces if use_flame else None
    region_vids = (
        {k: v for k, v in model.assets.vertex_masks.items()
         if k in ("eyes_left", "eyes_right", "mouth", "nose")}
        if use_flame else {}
    )
    H, W = template_camera.height, template_camera.width
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    H_pad = padded_height(H, tile_cfg.tile_h, n_tile)
    rows = H_pad // n_tile

    def device_fn(sh_degree: int, state: TrainState, cb: CameraBatch,
                  gt: jnp.ndarray, bg: jnp.ndarray):
        tile_idx = jax.lax.axis_index("tile")
        y0 = (tile_idx * rows).astype(jnp.float32)
        cam = _DeviceCamera(
            world_view=cb.world_view[0], proj=cb.proj[0],
            full_proj=cb.full_proj[0], camera_center=cb.camera_center[0],
            tan_half_fovx=cb.tan_half_fovx[0], tan_half_fovy=cb.tan_half_fovy[0],
            width=W, height=H,
        )
        timestep = cb.timestep[0]
        gt_local = gt[0]  # [rows, W, 3], uint8 or float
        # Gather the compact dtype, then convert (uint8 = 4x less ICI/reshard
        # traffic; gt_to_float is THE shared conversion — see its docstring).
        gt_full = gt_to_float(
            jax.lax.all_gather(gt_local, "tile", axis=0).reshape(H_pad, W, 3)[:H]
        )

        def geometry(params, flame):
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
                if o.lambda_laplacian != 0:
                    verts, verts_cano = model.forward(fp, return_verts_cano=True)
                else:
                    verts, verts_cano = model.forward(fp), None
                frames = face_frames(verts[0], faces)
            else:
                verts = verts_cano = None
                frames = None
            if gauss_shard:
                # Dual-role axis: this device owns Gaussians [off, off+chunk).
                cap = params.means.shape[0]
                assert cap % n_tile == 0, (
                    f"gauss_shard needs capacity ({cap}) divisible by n_tile ({n_tile})"
                )
                chunk = cap // n_tile
                off = tile_idx * chunk
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, off, chunk, axis=0)
                p_dev = jax.tree_util.tree_map(sl, params)
                aux_dev = jax.tree_util.tree_map(sl, state.aux)
            else:
                p_dev, aux_dev = params, state.aux
            wg = world_gaussians(p_dev, aux_dev, frames)
            proj = project_from_params(wg.means, wg.scales, wg.quats, cam, alive=wg.alive)
            dirs = wg.means - cam.camera_center
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
            colors = eval_sh_color_kc(wg.sh, dirs, sh_degree)
            opac = jnp.where(proj.mask, wg.opacity, 0.0)
            if gauss_shard:
                # One gather of the compact screen attributes restores the
                # full set in original order; its VJP (psum_scatter) hands
                # each device back exactly its slice's cotangents. Int/bool
                # fields ride along grad-free.
                gather = lambda x: jax.lax.all_gather(x, "tile", axis=0, tiled=True)
                proj = jax.tree_util.tree_map(gather, proj)
                colors = gather(colors)
                opac = gather(opac)
            # NOTE: the per-device row-band shift (y0) happens inside
            # image_loss, NOT here — keeping geometry's outputs free of the
            # tile-varying y0 gives every screen leaf one uniform vma per
            # layout mode, so the image cotangents can be pre-reduced to
            # geometry's exact output type (jax ≥ 0.9 vjp typechecks it).

            # Regularisers ride the same VJP as the screen seam (one FLAME
            # forward+backward per step; mirrors trainer.make_train_step).
            # Computed on the FULL params (not the gauss_shard slice) with the
            # gathered visibility — identical across 'tile' by value.
            reg_total = jnp.zeros(())
            if use_flame:
                visible = jax.lax.stop_gradient(proj.radius > 0)
                nvis = jnp.maximum(jnp.sum(visible), 1)
                # Full knob parity with trainer.make_train_step (reference
                # `train.py:213-229`): metric-unit variants use the per-
                # Gaussian face scaling (frames/aux are replicated, so this
                # is identical across 'tile' by value).
                fs = frames.scaling[state.aux.binding]        # [N, 1]
                if o.metric_xyz:
                    xyz_excess = safe_norm(
                        jax.nn.relu(params.means * fs - o.threshold_xyz), axis=1
                    )
                else:
                    xyz_excess = jax.nn.relu(
                        safe_norm(params.means, axis=1) - o.threshold_xyz
                    )
                reg_total += (
                    jnp.sum(jnp.where(visible, xyz_excess, 0.0)) / nvis
                    * o.lambda_xyz
                )
                if o.lambda_scale != 0:
                    scale_val = jnp.exp(params.log_scales)
                    if o.metric_scale:
                        scale_val = scale_val * fs            # get_scaling
                    sc = jax.nn.relu(scale_val - o.threshold_scale)
                    reg_total += jnp.sum(
                        jnp.where(visible, safe_norm(sc, axis=1), 0.0)
                    ) / nvis * o.lambda_scale
                if flame.dynamic_offset is not None and o.lambda_dynamic_offset != 0:
                    # `compute_dynamic_offset_loss`
                    # (`scene/flame_gaussian_model.py:155-158`).
                    reg_total += (
                        safe_norm(flame.dynamic_offset[timestep], axis=-1).mean()
                        * o.lambda_dynamic_offset
                    )
                if (
                    flame.dynamic_offset is not None
                    and o.lambda_dynamic_offset_std != 0
                ):
                    # std over time (Bessel-corrected), mean over verts/xyz
                    # (`train.py:228-229`).
                    reg_total += (
                        jnp.std(flame.dynamic_offset, axis=0, ddof=1).mean()
                        * o.lambda_dynamic_offset_std
                    )
                if o.lambda_laplacian != 0:
                    reg_total += (
                        model.laplacian_loss(verts, verts_cano) * o.lambda_laplacian
                    )
            return ((proj.mean2d, proj.conic, colors, opac), reg_total), (proj, verts)

        (screen, reg_total), vjp_geo, (proj, verts) = jax.vjp(
            geometry, state.params, state.flame, has_aux=True
        )
        proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)
        # Production path: the sorted-data pipeline with the SAME Pallas
        # kernels as the single-chip step, run per-device on its row band
        # (each device sorts/composites only its band's pairs). Fallback:
        # the scan-compositor table path.
        use_sorted = cfg.pipeline.use_sorted and cfg.pipeline.use_pallas
        # Row-band shift into this device's sub-viewport (y0 varies per
        # 'tile' device; applied here, not in geometry — see note there).
        band_shift = jnp.concatenate([jnp.zeros((1,)), y0[None]])[None, :]
        if use_sorted:
            from ..ops.rasterize_sorted import rasterize_sorted

            spec = tile_cfg.tier_spec(proj.mean2d.shape[0])
        else:
            binned = bin_gaussians(
                proj_sg._replace(
                    mean2d=jax.lax.stop_gradient(screen[0]) - band_shift
                ),
                rows, W, tile_cfg,
                opacity=jax.lax.stop_gradient(screen[3]),
            )

        def image_loss(screen, color_net):
            mean2d, conic, colors, opac = screen
            mean2d = mean2d - band_shift
            plan_aux = None
            if use_sorted:
                img_local, _alpha, plan = rasterize_sorted(
                    proj_sg._replace(mean2d=mean2d, conic=conic),
                    colors, opac, rows, W, bg,
                    tile_cfg.tile_h, tile_cfg.tile_w, spec, amp=o.use_amp,
                )
                plan_aux = (plan.budget_overflow, plan.max_footprint)
            else:
                img_local, _ = rasterize_binned(
                    mean2d, conic, colors, opac, binned, rows, W, bg, tile_cfg
                )
            img = jax.lax.all_gather(img_local, "tile", axis=0).reshape(H_pad, W, 3)[:H]
            if color_net is not None:
                img = color_net_apply(color_net, img)
            if o.use_region_adaptive_loss:
                if use_flame:
                    wmap = flame_region_weight_map(
                        jax.lax.stop_gradient(verts[0]), region_vids, cam, H, W,
                        o.region_weight_eyes, o.region_weight_mouth,
                        o.region_weight_nose,
                    )
                else:
                    wmap = heuristic_weight_map(
                        H, W, o.region_weight_eyes, o.region_weight_mouth,
                        o.region_weight_nose, o.region_weight_face,
                    )
                l1 = weighted_l1_loss(img, gt_full, wmap[..., None]) * (
                    1.0 - o.lambda_dssim
                )
            else:
                l1 = l1_loss(img, gt_full) * (1.0 - o.lambda_dssim)
            s = (1.0 - ssim(jnp.transpose(img, (2, 0, 1)),
                            jnp.transpose(gt_full, (2, 0, 1)),
                            amp=o.use_amp)) * o.lambda_dssim
            extra = jnp.zeros(())
            if color_net is not None and o.lambda_color_reg > 0:
                extra = extra + color_net_reg(color_net) * o.lambda_color_reg
            if state.contrastive is not None and o.lambda_contrastive > 0:
                extra = extra + contrastive_loss(
                    state.contrastive, img, o.contrastive_downsample
                ) * o.lambda_contrastive
            # pmean over 'tile' is a numerical no-op (every tile-device holds
            # the same gathered-image loss) but marks the loss mesh-invariant
            # for the vma type system; its transpose distributes cotangents
            # that the all_gather transpose re-sums exactly.
            loss = jax.lax.pmean(jax.lax.pmean(l1 + s + extra, "data"), "tile")
            return loss, (img, l1, s, plan_aux)

        loss, vjp_img, (img, l1, s, plan_aux) = jax.vjp(
            image_loss, screen, state.color_net, has_aux=True
        )
        # Seed 1/(n_tile·n_data): under check_vma=False every pmean
        # transposes to a SUM over its axis (psum), so the two loss pmeans
        # contribute a factor n_tile·n_data on the way back; seeding the
        # reciprocal restores exactly the single-chip cotangent scale (each
        # device then holds `1/(nt·nd) × its band's partial × nt` from the
        # all_gather transpose, and the mesh-wide psum of g_params below
        # yields the mean-over-cameras gradient). Verified exact against
        # make_train_step by tests/test_sharded.py.
        g_screen, g_color = vjp_img(jnp.ones(()) / (n_tile * n_data))

        # --- densification statistics (global, replicated result) ----------
        # Per-camera pixel-space mean2d grad: undo the data-pmean factor.
        g_cam = jax.lax.psum(g_screen[0], "tile") * n_data
        vis = proj_sg.radius > 0
        radius_f = jnp.where(vis, proj_sg.radius.astype(jnp.float32), 0.0)
        if gauss_shard:
            # After the gather these are value-identical across 'tile', but
            # their vma type still reads "varying" (the type system can't see
            # through the gather); an exact pmax re-types them invariant so
            # the replicated-state outputs typecheck.
            vis = jax.lax.pmax(vis.astype(jnp.int32), "tile") > 0
            radius_f = jax.lax.pmax(radius_f, "tile")
        gn = jnp.linalg.norm(
            g_cam * jnp.array([[W * 0.5, H * 0.5]], g_cam.dtype), axis=-1
        )
        d_accum = jax.lax.psum(jnp.where(vis, gn, 0.0), "data")
        d_denom = jax.lax.psum(vis.astype(jnp.float32), "data")
        d_radii = jax.lax.pmax(radius_f, "data")
        aux_new = dataclasses.replace(
            state.aux,
            grad_accum=state.aux.grad_accum + d_accum,
            denom=state.aux.denom + d_denom,
            max_radii2d=jnp.maximum(state.aux.max_radii2d, d_radii),
        )

        # --- gradients -----------------------------------------------------
        # Joint VJP: image cotangents (already carrying the data-pmean 1/n
        # factor) plus a reg cotangent of 1/(n_tile·n_data) — the mesh-wide
        # psum below then yields exactly mean-over-cameras reg grads (reg is
        # identical across 'tile', so psum over 'tile' multiplies by n_tile).
        reg_cot = reg_total * 0.0 + jnp.float32(1.0 / (n_tile * n_data))
        g_params, g_flame = vjp_geo((g_screen, reg_cot))
        # Image-path grads differ per device: reduce over the whole mesh.
        g_params = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(jax.lax.psum(g, "tile"), "data"), g_params
        )
        if use_flame:
            g_flame = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(jax.lax.psum(g, "tile"), "data"), g_flame
            )
        reg_mean = jax.lax.pmean(jax.lax.pmean(reg_total, "data"), "tile")

        # --- updates (identical on every device) ---------------------------
        lr = gaussian_lr_tree(state.params, state.adam.step + 1, cfg, spatial_lr_scale)
        new_params, new_adam = adam_update(state.params, g_params, state.adam, lr)
        new_flame, new_flame_adam = state.flame, state.flame_adam
        if use_flame:
            new_flame, new_flame_adam = adam_update(
                state.flame, g_flame, state.flame_adam,
                flame_lr_tree(cfg, state.flame),
            )
        new_color, new_color_adam = state.color_net, state.color_adam
        if state.color_net is not None:
            g_color = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(jax.lax.psum(g, "tile"), "data"), g_color
            )
            lr_c = jax.tree_util.tree_map(lambda _: o.color_net_lr, state.color_net)
            new_color, new_color_adam = adam_update(
                state.color_net, g_color, state.color_adam, lr_c
            )
        new_contrastive = state.contrastive
        if state.contrastive is not None:
            upd = contrastive_update(state.contrastive, img, o.contrastive_downsample)
            # Cache data-group 0's render (exact single-chip semantics at
            # data=1; a defined choice beyond), re-typed mesh-invariant: the
            # psum selects group 0, the pmean over identical values re-types.
            pick = (jax.lax.axis_index("data") == 0).astype(upd.images.dtype)
            images = jax.lax.pmean(
                jax.lax.psum(upd.images * pick, "data"), "tile"
            )
            new_contrastive = upd._replace(images=images)

        metrics = {
            "loss": loss + reg_mean,
            "l1": l1,
            "ssim": s,
            "psnr": psnr(jax.lax.stop_gradient(img), gt_full),
            "num_visible": jnp.sum(vis).astype(jnp.float32),
        }
        if use_sorted:
            metrics["overflow"] = jnp.zeros((), jnp.float32)
            metrics["budget_overflow"] = plan_aux[0].astype(jnp.float32)
            metrics["max_footprint"] = plan_aux[1].astype(jnp.float32)
        else:
            metrics["overflow"] = binned.overflow.astype(jnp.float32)
            metrics["budget_overflow"] = binned.budget_overflow.astype(jnp.float32)
        # Reduce every metric to a mesh-invariant scalar. pmean is exact for
        # the already-identical ones and an average for per-camera ones;
        # overflow/budget_overflow are flags (any nonzero triggers growth);
        # max_footprint must be the mesh MAX (it sizes the grown budgets).
        mfp = metrics.pop("max_footprint", None)
        metrics = {
            k: jax.lax.pmean(jax.lax.pmean(v, "data"), "tile")
            for k, v in metrics.items()
        }
        if mfp is not None:
            metrics["max_footprint"] = jax.lax.pmax(
                jax.lax.pmax(mfp, "data"), "tile"
            )
        # Advance the PRNG key exactly like the single-chip step (replicated
        # state, deterministic split → identical on every device); without
        # this the two drivers' states diverge in the key field and any
        # future in-step randomness would silently freeze on this path.
        _, key_next = jax.random.split(state.key)
        new_state = dataclasses.replace(
            state, params=new_params, aux=aux_new, adam=new_adam,
            flame=new_flame, flame_adam=new_flame_adam,
            color_net=new_color, color_adam=new_color_adam,
            contrastive=new_contrastive, key=key_next,
        )
        return new_state, metrics

    state_spec = P()  # replicated
    cam_spec = CameraBatch(
        world_view=P("data"), proj=P("data"), full_proj=P("data"),
        camera_center=P("data"), timestep=P("data"),
        tan_half_fovx=P("data"), tan_half_fovy=P("data"),
    )
    gt_spec = P("data", "tile")

    @functools.lru_cache(maxsize=8)
    def _sharded(sh_degree: int):
        # check_vma=False: with checking on, jax ≥ 0.9's HLO interpreter for
        # `pallas_call` (the off-TPU kernel path the multichip dryrun runs)
        # rejects kernel-internal mixed-vma ops ("Primitive dynamic_slice
        # requires varying manual axes to match ... as a temporary
        # workaround pass check_vma=False") — the kernel jaxpr can't be
        # annotated from outside. Collective placement in device_fn is
        # hand-verified instead: tests/test_sharded.py proves exact
        # equivalence against the single-chip step on every mesh layout.
        return jax.shard_map(
            functools.partial(device_fn, sh_degree),
            mesh=mesh,
            in_specs=(state_spec, cam_spec, gt_spec, P()),
            out_specs=(state_spec, P()),
            check_vma=False,
        )

    @functools.partial(jax.jit, static_argnames=("sh_degree",), donate_argnums=(0,))
    def step(state, cams: CameraBatch, gt: jnp.ndarray, bg: jnp.ndarray,
             sh_degree: int = 0):
        return _sharded(sh_degree)(state, cams, gt, bg)

    return step
