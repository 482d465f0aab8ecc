"""Host training loop: the library behind `scripts/train.py`.

Functional equivalent of the reference driver (`train.py:45-311`):
per-iteration jitted step (trainer.make_train_step), with host-driven
events at the reference cadence —

  * SH warm-up every 1000 iters (`train.py:176-177`),
  * densify/prune every `densification_interval` in
    [densify_from_iter, densify_until_iter) with smart percentile
    thresholds when innovation 2 is on (`train.py:264-273`),
  * opacity reset every `opacity_reset_interval`,
  * progressive-resolution camera swaps at milestones (innovation 3,
    `train.py:127-141`) — each scale gets its own jitted step (XLA statically
    shapes the image),
  * eval reports (`training_report`, `train.py:313-394`), PLY saves, and full
    resume checkpoints (`train.py:287-289`).

The loop owns host-side state (prefetchers, logs); everything numeric lives
in the donated TrainState pytree on device.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.cameras import Camera, jit_static_key
from ..data.pipeline import EpochSampler, Prefetcher, load_view
from ..data.scene import Scene
from ..models.densify import (
    DensifyConfig, densify_and_prune, reset_opacity,
)
from ..models.binding import face_frames
from ..models.flame.flame_model import FlameModel, FlameParams
from ..models.gaussians import GaussianAux, GaussianParams, init_bound, init_from_points, num_alive
from ..ops.rasterize_tiled import TileConfig, render_tiled
from ..training import innovations
from ..training.checkpoint import save_train_state, load_train_state
from ..training.loss import psnr as psnr_fn, ssim as ssim_fn
from ..training.trainer import (
    TrainState, active_sh_degree, init_train_state, make_train_scan,
    make_train_step,
)


def flame_init_from_table(
    table: Dict[str, np.ndarray],
    n_shape: Optional[int] = None,
    n_expr: Optional[int] = None,
) -> dict:
    """Scene flame table (reference npz key names) → trainer kwarg names.

    `n_shape`/`n_expr` truncate or zero-pad the dataset coefficients to the
    model's blendshape count (datasets store 300/100; smaller test models
    use fewer)."""

    def fit(x: np.ndarray, n: Optional[int]) -> np.ndarray:
        if n is None or x.shape[-1] == n:
            return x
        if x.shape[-1] > n:
            return x[..., :n]
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        return np.pad(x, pad)

    return {
        "shape": fit(table["shape"], n_shape),
        "expr": fit(table["expr"], n_expr),
        "rotation": table["rotation"],
        "neck": table["neck_pose"],
        "jaw": table["jaw_pose"],
        "eyes": table["eyes_pose"],
        "translation": table["translation"],
        "static_offset": table["static_offset"],
    }


def flame_table_from_state(state: TrainState, template: Dict[str, np.ndarray]) -> dict:
    """Export trained FLAME params in the reference npz layout
    (`scene/flame_gaussian_model.py:218-223`)."""
    out = dict(template)
    out["shape"] = np.asarray(state.flame_static.shape)
    out["expr"] = np.asarray(state.flame.expr)
    out["rotation"] = np.asarray(state.flame.rotation)
    out["neck_pose"] = np.asarray(state.flame.neck)
    out["jaw_pose"] = np.asarray(state.flame.jaw)
    out["eyes_pose"] = np.asarray(state.flame.eyes)
    out["translation"] = np.asarray(state.flame.translation)
    if state.flame_static.static_offset is not None:
        out["static_offset"] = np.asarray(state.flame_static.static_offset)
    return out


def tile_config(cfg: Config) -> TileConfig:
    p = cfg.pipeline
    return TileConfig(
        tile_h=p.tile_h, tile_w=p.tile_w, capacity=p.capacity_per_tile,
        max_tiles_per_gaussian=p.max_tiles_per_gaussian,
        base_budget=p.base_budget, tiers=tuple(p.tiers),
    )


@dataclasses.dataclass
class TrainerHarness:
    """Everything `train()` assembles before the loop."""

    cfg: Config
    scene: Scene
    model: Optional[FlameModel]
    state: TrainState
    spatial_lr_scale: float
    start_iteration: int = 0
    # The loop's CURRENT tile budgets (grows on overflow recovery). Render
    # consumers outside the loop (the GUI server) re-read this so their
    # cached render fns never keep an overflowing budget.
    live_tile_config: Optional["TileConfig"] = None


def build_harness(
    cfg: Config,
    model: Optional[FlameModel] = None,
    key: Optional[jax.Array] = None,
    start_checkpoint: str = "",
) -> TrainerHarness:
    m = cfg.model
    scales = (
        tuple(sorted(set(cfg.opt.resolution_schedule), reverse=True))
        if cfg.opt.use_progressive_resolution else (1.0,)
    )
    # Progressive schedule entries are image-scale factors (<1 = smaller);
    # Scene wants divisors.
    res_scales = tuple(1.0 / s for s in scales)
    scene = Scene(
        m.source_path, model_path=m.model_path, resolution=m.resolution,
        white_background=m.white_background, eval_split=m.eval,
        target_path=m.target_path, resolution_scales=res_scales,
        select_camera_id=m.select_camera_id,
        num_verts_hint=model.num_verts if model is not None else 0,
    )
    key = key if key is not None else jax.random.PRNGKey(0)

    if m.bind_to_mesh:
        if model is None:
            raise ValueError("bind_to_mesh requires a FlameModel")
        params, aux = init_bound(model.num_faces, capacity=m.capacity, key=key)
        flame_init = flame_init_from_table(
            scene.flame_table, n_shape=model.cfg.n_shape, n_expr=model.cfg.n_expr
        )
        state = init_train_state(
            params, aux, cfg,
            num_timesteps=scene.num_timesteps,
            n_expr=model.cfg.n_expr, n_shape=model.cfg.n_shape,
            num_verts=model.num_verts, key=key,
            image_hw=(scene.train_cameras()[0].height, scene.train_cameras()[0].width),
            flame_init=flame_init,
        )
    else:
        pcd = scene.info.point_cloud
        if pcd is None:
            raise ValueError("unbound training requires a dataset point cloud")
        params, aux = init_from_points(pcd.points, pcd.colors, capacity=m.capacity)
        state = init_train_state(
            params, aux, cfg, key=key,
            image_hw=(scene.train_cameras()[0].height, scene.train_cameras()[0].width),
        )
        model = None

    start_iteration = 0
    if start_checkpoint:
        state, start_iteration = load_train_state(start_checkpoint, state)
        print(f"resumed from {start_checkpoint} at iteration {start_iteration}")

    if m.model_path:
        os.makedirs(m.model_path, exist_ok=True)
        from ..config import to_json

        with open(os.path.join(m.model_path, "cfg_args.json"), "w") as f:
            f.write(to_json(cfg))
        if model is not None:
            # Self-contained model dir: render/viewers reload this exact
            # topology (teeth, masks, blendshape counts) without the
            # original template/licensed files.
            from ..models.flame.assets import save_assets

            save_assets(model.assets, os.path.join(m.model_path, "flame_assets.npz"))

    return TrainerHarness(
        cfg=cfg, scene=scene, model=model, state=state,
        spatial_lr_scale=scene.cameras_extent, start_iteration=start_iteration,
    )


def probe_tier_budgets(
    tcfg: TileConfig,
    cfg: Config,
    model: Optional[FlameModel],
    state: TrainState,
    camera: Camera,
    verbose: bool = True,
) -> TileConfig:
    """Init-time tier auto-probe (sorted-data pipeline).

    When no explicit `tiers` are configured, size them from the FIRST
    frame's measured footprint distribution (`sort_binning.probe_tiers`)
    BEFORE compiling any step — the default configuration then renders the
    probe frame with zero tier-budget truncation and the margin headroom
    absorbs normal motion; densification drift beyond it is caught by
    ``budget_overflow`` → `_grow_tile_budgets`. bench.py runs the same
    probe, so a default `scripts/train.py` run reproduces the benched
    configuration."""
    if tcfg.tiers or not (cfg.pipeline.use_sorted and cfg.pipeline.use_pallas):
        return tcfg
    from ..models.gaussians import world_gaussians
    from ..ops.projection import project_from_params
    from ..ops.sort_binning import bbox_tiles, probe_tiers

    if model is not None and state.flame is not None:
        ts = int(getattr(camera, "timestep", 0) or 0)
        fp = FlameParams(
            shape=state.flame_static.shape,
            expr=state.flame.expr[ts][None],
            rotation=state.flame.rotation[ts][None],
            neck=state.flame.neck[ts][None],
            jaw=state.flame.jaw[ts][None],
            eyes=state.flame.eyes[ts][None],
            translation=state.flame.translation[ts][None],
            static_offset=state.flame_static.static_offset,
        )
        verts = model.forward(fp)
        frames = face_frames(verts[0], model.faces)
    else:
        frames = None
    wg = world_gaussians(state.params, state.aux, frames)
    proj = project_from_params(wg.means, wg.scales, wg.quats, camera, alive=wg.alive)
    opac = jnp.where(proj.mask, wg.opacity, 0.0)
    _tx, _ty, _bw, ntiles, _nty, _ntx = bbox_tiles(
        proj, camera.height, camera.width, tcfg.tile_h, tcfg.tile_w, opacity=opac
    )
    spec = probe_tiers(np.asarray(jnp.where(proj.mask, ntiles, 0)))
    if verbose:
        print(
            f"[info] tier auto-probe: base={spec.base} tiers={spec.tiers} "
            f"(expansion {spec.expansion_size(state.params.means.shape[0])} slots)"
        )
    return dataclasses.replace(tcfg, base_budget=spec.base, tiers=spec.tiers)


def make_render_fn(model: Optional[FlameModel], cfg: Config, tcfg: TileConfig):
    """Jitted full-forward render for eval/offline use."""
    use_flame = model is not None

    def render(state: TrainState, camera: Camera, timestep, bg, sh_degree: int):
        if use_flame:
            fp = FlameParams(
                shape=state.flame_static.shape,
                expr=state.flame.expr[timestep][None],
                rotation=state.flame.rotation[timestep][None],
                neck=state.flame.neck[timestep][None],
                jaw=state.flame.jaw[timestep][None],
                eyes=state.flame.eyes[timestep][None],
                translation=state.flame.translation[timestep][None],
                static_offset=state.flame_static.static_offset,
            )
            verts = model.forward(fp)
            frames = face_frames(verts[0], model.faces)
        else:
            frames = None
        from ..models.gaussians import world_gaussians

        wg = world_gaussians(state.params, state.aux, frames)
        out = render_tiled(
            wg.means, wg.scales, wg.quats, wg.opacity, camera, bg,
            sh=wg.sh, sh_degree=sh_degree, alive=wg.alive, cfg=tcfg,
            use_pallas=cfg.pipeline.use_pallas,
        )
        img = out.color
        if state.color_net is not None:
            img = innovations.color_net_apply(state.color_net, img)
        return img

    return jax.jit(render, static_argnames=("sh_degree",))


@functools.lru_cache(maxsize=1)
def _eval_lpips_params():
    """LPIPS weights for training-time eval ($GSAVATARS_LPIPS_WEIGHTS; the
    reference evaluates LPIPS every interval, train.py:375-384). Cached —
    None when the licensed weights are not available."""
    from ..metrics.lpips import maybe_load_default

    return maybe_load_default()


def evaluate_split(
    harness: TrainerHarness, split: str, render_fn, sh_degree: int,
    max_views: Optional[int] = None, bg: Optional[jnp.ndarray] = None,
    return_images: bool = False,
):
    """PSNR/SSIM[/LPIPS] over a split (`training_report`, `train.py:313-394`).

    LPIPS is included when $GSAVATARS_LPIPS_WEIGHTS points at a converted
    checkpoint (metrics/lpips.py). `return_images=True` additionally returns
    the first rendered/gt pair for TensorBoard image logging."""
    scene, cfg = harness.scene, harness.cfg
    cams = scene.cameras(split)
    recs = scene.records(split)
    if not cams:
        return ({}, None) if return_images else {}
    if bg is None:
        bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
    n = len(cams) if max_views is None else min(max_views, len(cams))
    lp = _eval_lpips_params()
    psnrs, ssims, lpipss = [], [], []
    first_pair = None
    for i in range(n):
        gt = jnp.asarray(load_view(recs[i], cams[i]))
        img = render_fn(harness.state, jit_static_key(cams[i]),
                        jnp.int32(cams[i].timestep), bg, sh_degree)
        img = jnp.clip(img, 0.0, 1.0)
        if i == 0 and return_images:
            first_pair = (np.asarray(img), np.asarray(gt))
        psnrs.append(float(psnr_fn(img, gt)))
        ssims.append(float(ssim_fn(
            jnp.transpose(img, (2, 0, 1)), jnp.transpose(gt, (2, 0, 1))
        )))
        if lp is not None:
            from ..metrics.lpips import lpips as lpips_fn

            lpipss.append(float(lpips_fn(lp, img, gt)))
    m = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)), "n": n}
    if lpipss:
        m["lpips"] = float(np.mean(lpipss))
    if return_images:
        return m, first_pair
    return m


def densify_event(harness: TrainerHarness, iteration: int) -> dict:
    """One adaptive-density-control event (cadence: `train.py:264-273`)."""
    cfg, state, model = harness.cfg, harness.state, harness.model
    o = cfg.opt
    dcfg = DensifyConfig(
        grad_threshold=o.densify_grad_threshold,
        percent_dense=o.percent_dense,
        min_opacity=0.005,
        max_screen_size=20.0 if iteration > o.opacity_reset_interval else 0.0,
    )
    clone_thr = split_thr = None
    if o.use_smart_densification:
        clone_thr, split_thr = innovations.smart_thresholds(
            state.aux.grad_accum, state.aux.denom, o.densify_grad_threshold,
            o.densify_percentile_clone, o.densify_percentile_split,
        )
    frames = None
    if model is not None:
        t = 0
        fp = FlameParams(
            shape=state.flame_static.shape,
            expr=state.flame.expr[t][None],
            rotation=state.flame.rotation[t][None],
            neck=state.flame.neck[t][None],
            jaw=state.flame.jaw[t][None],
            eyes=state.flame.eyes[t][None],
            translation=state.flame.translation[t][None],
            static_offset=state.flame_static.static_offset,
        )
        verts = model.forward(fp)
        frames = face_frames(verts[0], model.faces)
    key, sub = jax.random.split(state.key)
    params, aux, mu, nu, report = densify_and_prune(
        state.params, state.aux, state.adam.mu, state.adam.nu, sub,
        extent=harness.spatial_lr_scale, cfg=dcfg, frames=frames,
        clone_threshold=clone_thr, split_threshold=split_thr,
    )
    harness.state = dataclasses.replace(
        state, params=params, aux=aux,
        adam=state.adam._replace(mu=mu, nu=nu), key=key,
    )
    return {k: int(v) for k, v in report._asdict().items()}


def grow_gauss_capacity_event(harness: TrainerHarness, factor: int = 2) -> int:
    """Double the Gaussian slot capacity after densify reported dropped
    requests (the CUDA reference grows tensors dynamically; fixed-capacity
    pytrees must grow explicitly — one retrace at the next dispatch)."""
    from ..models.densify import grow_capacity

    state = harness.state
    new_cap = state.params.capacity * factor
    params, aux, mu, nu = grow_capacity(
        state.params, state.aux, state.adam.mu, state.adam.nu, new_cap
    )
    harness.state = dataclasses.replace(
        state, params=params, aux=aux, adam=state.adam._replace(mu=mu, nu=nu)
    )
    return new_cap


def opacity_reset_event(harness: TrainerHarness) -> None:
    state = harness.state
    params, mu, nu = reset_opacity(state.params, state.adam.mu, state.adam.nu)
    harness.state = dataclasses.replace(
        state, params=params, adam=state.adam._replace(mu=mu, nu=nu)
    )


class DeviceGtCache:
    """All ground-truth views resident on device as uint8 (upload once).

    Remote/tunnelled TPUs pay seconds per multi-MB host→device transfer;
    streaming one image per step starves the chip. For datasets under
    `max_bytes` the whole split is shipped once and sliced on device
    (uint8 → 4× smaller than f32; the step converts for free)."""

    def __init__(self, records, cameras, max_bytes: int = 4 << 30,
                 batch_decode: int = 64):
        h, w = cameras[0].height, cameras[0].width
        n = len(records)
        if n * h * w * 3 > max_bytes:
            raise MemoryError("dataset too large for device GT cache")
        chunks = []
        for i in range(0, n, batch_decode):
            imgs = np.stack([
                load_view(records[j], cameras[j])
                for j in range(i, min(i + batch_decode, n))
            ])
            chunks.append((np.clip(imgs, 0.0, 1.0) * 255).astype(np.uint8))
        self.data = jax.device_put(np.concatenate(chunks, 0))

    def get(self, view: int) -> jnp.ndarray:
        from ..data.pipeline import gt_to_float

        return gt_to_float(self.data[view])


def _post_step_events(
    harness: TrainerHarness,
    it: int,
    sh_deg: int,
    *,
    writer,
    render_fn,
    eval_every: Optional[int],
    eval_views: int,
    bg,
    save_set: set,
    ckpt_set: set,
    coordinator: bool = True,
    eval_set: frozenset = frozenset(),
) -> None:
    """Densify / opacity-reset / eval / save / checkpoint at the standard
    cadences (`train.py:264-289` in the reference). Shared by `train` and
    `train_sharded` so the event logic cannot drift between drivers.

    Multi-host: state-mutating events (densify, opacity reset, capacity
    growth) run on EVERY process — they are deterministic functions of the
    replicated state, so all processes stay in lockstep. Only I/O (eval
    render, save, checkpoint, TensorBoard, prints) is gated on
    `coordinator` (process 0)."""
    cfg, scene, model = harness.cfg, harness.scene, harness.model
    o = cfg.opt
    # Strictly after densify_from_iter (reference train.py:268 uses `>`;
    # at exactly densify_from_iter only the white-background opacity reset
    # below may fire).
    if (o.densify_from_iter < it < o.densify_until_iter
            and it % o.densification_interval == 0):
        report = densify_event(harness, it)
        if writer:
            for k in ("cloned", "split", "pruned", "dropped"):
                writer.add_scalar(f"densify/{k}", report[k], it)
        if report.get("dropped", 0) > 0:
            new_cap = grow_gauss_capacity_event(harness)
            if coordinator:
                print(
                    f"[warn] densify dropped {report['dropped']} grow requests "
                    f"— Gaussian capacity doubled to {new_cap} (will retrace)"
                )
    # Reference resets opacity on the interval AND once at densify_from_iter
    # for white-background scenes (train.py:272-273).
    if it < o.densify_until_iter and (
        it % o.opacity_reset_interval == 0
        or (cfg.model.white_background and it == o.densify_from_iter)
    ):
        opacity_reset_event(harness)
    # Multi-host: coordinator-only jits must not touch multi-process global
    # arrays (that would be a collective the other processes never join —
    # deadlock). Detach a process-local copy of the replicated state first.
    ev_harness = harness
    if coordinator and jax.process_count() > 1 and (
        (eval_every and it % eval_every == 0) or it in eval_set
        or it in save_set or it in ckpt_set
    ):
        local_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), harness.state
        )
        ev_harness = dataclasses.replace(harness, state=local_state)
    if coordinator and ((eval_every and it % eval_every == 0)
                        or it in eval_set):
        for split in ("val", "test"):
            m, pair = evaluate_split(
                ev_harness, split, render_fn, sh_deg, max_views=eval_views,
                bg=bg, return_images=True,
            ) if writer else (evaluate_split(
                ev_harness, split, render_fn, sh_deg, max_views=eval_views, bg=bg
            ), None)
            if m:
                extra = f" lpips={m['lpips']:.4f}" if "lpips" in m else ""
                print(f"  [eval {split}] psnr={m['psnr']:.2f} "
                      f"ssim={m['ssim']:.4f}{extra}")
                if writer:
                    writer.add_scalar(f"{split}/psnr", m["psnr"], it)
                    writer.add_scalar(f"{split}/ssim", m["ssim"], it)
                    if "lpips" in m:
                        writer.add_scalar(f"{split}/lpips", m["lpips"], it)
            if writer and pair is not None:
                # Render / GT / seismic error map images + opacity histogram
                # (reference logging set, train.py:326-346,385-391).
                from ..utils.image import error_map

                img, gt = pair
                writer.add_image(f"{split}/render", img, it, dataformats="HWC")
                writer.add_image(f"{split}/gt", gt, it, dataformats="HWC")
                writer.add_image(
                    f"{split}/error", error_map(img, gt), it, dataformats="HWC"
                )
        if writer:
            alive = np.asarray(ev_harness.state.aux.alive)
            opac = 1.0 / (1.0 + np.exp(
                -np.asarray(ev_harness.state.params.logit_opacity[:, 0])
            ))
            opac = opac[alive]
            if opac.size:
                writer.add_histogram("scene/opacity", opac, it)
            writer.add_scalar("scene/total_points", int(alive.sum()), it)
    if coordinator and it in save_set:
        flame_param = (
            flame_table_from_state(ev_harness.state, scene.flame_table)
            if model is not None else None
        )
        scene.save(it, ev_harness.state.params, ev_harness.state.aux, flame_param)
    if coordinator and it in ckpt_set:
        save_train_state(
            os.path.join(cfg.model.model_path, f"chkpnt{it}.npz"),
            ev_harness.state, it,
        )


def chunk_boundary(
    i: int,
    *,
    iterations: int,
    steps_per_call: int,
    log_every: int,
    eval_every: Optional[int],
    opt,
    save_iterations: Sequence[int] = (),
    checkpoint_iterations: Sequence[int] = (),
    eval_iterations: Sequence[int] = (),
) -> int:
    """Last iteration (inclusive) of a scan chunk starting at iteration `i`.

    Two kinds of host events bound a chunk:

      * **post-step** events (log, densify, opacity reset, eval, save,
        checkpoint) act *after* iteration k — the chunk must END AT k;
      * **pre-step** config changes (SH warm-up bumps `active_sh_degree` at
        multiples of 1000; progressive resolution swaps cameras at each
        milestone m) take effect *for* iteration k — the chunk must end at
        k − 1 so the next chunk re-reads sh_degree / resolution before
        running k. Ending at k would run iteration k with the stale value
        and break single-step equivalence.
    """
    o = opt
    cands = [iterations, i + steps_per_call - 1]
    # Post-step events: end the chunk AT the event iteration.
    for interval in (log_every, o.densification_interval,
                     o.opacity_reset_interval, eval_every or 0):
        if interval and interval > 0:
            cands.append(((i + interval - 1) // interval) * interval)
    for s in (list(save_iterations) + list(checkpoint_iterations)
              + list(eval_iterations)):
        if s >= i:
            cands.append(s)
    # The one-time white-background opacity reset fires at exactly
    # densify_from_iter (train.py:272-273) — a post-step event that is not
    # necessarily a multiple of any interval above.
    if o.densify_from_iter >= i:
        cands.append(o.densify_from_iter)
    # Pre-step config changes: end the chunk one iteration BEFORE.
    cands.append((i // 1000 + 1) * 1000 - 1)          # SH warm-up
    if o.use_progressive_resolution:
        for m in o.resolution_milestones:
            if m - 1 >= i:
                cands.append(m - 1)
    return max(min(c for c in cands if c >= i), i)


def _grow_tile_budgets(
    tcfg: TileConfig, overflow: int, budget_overflow: int, verbose: bool = True,
    max_footprint: int = 0, n_gauss: int = 0, sorted_mode: bool = False,
) -> Optional[TileConfig]:
    """Double whichever static tile budget overflowed (the CUDA reference's
    per-tile lists are dynamic; our static budgets must grow to match its
    behavior). Returns the grown config, or None if nothing overflowed.
    Shared by `train` and `train_sharded` so recovery cannot drift."""
    if overflow <= 0 and budget_overflow <= 0:
        return None
    if sorted_mode and budget_overflow > 0:
        # Sorted-data path: the only loss mode is the tier budget; grow the
        # concrete tier spec toward the observed footprint.
        from ..ops.sort_binning import grow_tiers

        spec = tcfg.tier_spec(n_gauss)
        new = grow_tiers(spec, max_footprint, n_gauss)
        tcfg = dataclasses.replace(tcfg, base_budget=new.base, tiers=new.tiers)
        if verbose:
            print(
                f"[warn] tier-budget overflow ({budget_overflow} bbox tiles "
                f"truncated, max footprint {max_footprint}) — tiers grown to "
                f"{new.tiers} (recompiling steps)"
            )
        return tcfg
    if overflow > 0:
        tcfg = dataclasses.replace(tcfg, capacity=tcfg.capacity * 2)
        if verbose:
            print(
                f"[warn] tile capacity overflow ({overflow} splats culled) — "
                f"tile capacity doubled to {tcfg.capacity} (recompiling steps)"
            )
    if budget_overflow > 0:
        tcfg = dataclasses.replace(
            tcfg, max_tiles_per_gaussian=tcfg.max_tiles_per_gaussian * 2
        )
        if verbose:
            print(
                f"[warn] tile-budget overflow ({budget_overflow} bbox tiles "
                "truncated) — max_tiles_per_gaussian doubled to "
                f"{tcfg.max_tiles_per_gaussian} (recompiling steps)"
            )
    return tcfg


def train(
    harness: TrainerHarness,
    iterations: Optional[int] = None,
    log_every: int = 100,
    eval_every: Optional[int] = None,
    save_iterations: Sequence[int] = (),
    checkpoint_iterations: Sequence[int] = (),
    eval_iterations: Sequence[int] = (),
    eval_views: int = 4,
    on_step: Optional[Callable[[int, dict], None]] = None,
    seed: int = 0,
    prefetch_workers: int = 4,
    device_cache_bytes: int = 4 << 30,
    steps_per_call: int = 1,
    gui_service: Optional[Callable[[int], bool]] = None,
    debug_from: int = -1,
) -> List[dict]:
    """Run the loop. Returns the logged metric dicts.

    `steps_per_call` > 1 dispatches chunks of steps as one jitted
    `lax.scan` (requires the device GT cache) — essential on remote /
    tunnelled TPUs where each dispatch costs ~1s, and still removes host
    overhead on local hardware. Chunks never cross an event boundary
    (densify, opacity reset, eval, save, log, SH warm-up), so results are
    identical to single-stepping.

    `gui_service` is invoked after EVERY dispatch (the reference services
    its viewer socket every iteration, train.py:143-172); it returns True
    while a client is connected, which drops the loop to single-step
    chunks so interactive frames stay fresh.

    `debug_from` >= 0 enables per-iteration finite assertions on metrics
    and parameters from that iteration on (the reference's `--debug_from`
    rasterizer debug mode, train.py:189-190) — implies single-stepping."""
    cfg, scene, model = harness.cfg, harness.scene, harness.model
    o = cfg.opt
    iterations = iterations if iterations is not None else o.iterations
    tcfg = tile_config(cfg)
    _train_cams = scene.cameras("train", 1.0)
    if _train_cams:
        tcfg = probe_tier_budgets(tcfg, cfg, model, harness.state, _train_cams[0])
    bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)

    if steps_per_call > 1 and len(
        {(c.fovx, c.fovy) for c in scene.cameras("train", 1.0)}
    ) > 1:
        # fov is static camera metadata; a stacked scan trace can only
        # carry one rig intrinsic. The sharded driver traces per-view fovs
        # (parallel/sharded.py CameraBatch); here we stay correct by
        # single-stepping.
        print("[warn] per-camera intrinsics detected — disabling scan "
              "chunking (single-step dispatch; train_sharded supports "
              "mixed intrinsics at full speed)")
        steps_per_call = 1

    steps: Dict[float, Callable] = {}
    scans: Dict[float, Callable] = {}
    sources: Dict[float, object] = {}
    samplers: Dict[float, object] = {}

    def step_for(scale: float):
        if scale not in steps:
            # Reads the CURRENT tcfg: overflow recovery rebinds it and clears
            # `steps`/`scans` so the next call compiles the larger capacity.
            steps[scale] = make_train_step(
                model, cfg, tcfg, spatial_lr_scale=harness.spatial_lr_scale
            )
            if steps_per_call > 1:
                scans[scale] = make_train_scan(
                    model, cfg, tcfg, spatial_lr_scale=harness.spatial_lr_scale
                )
        if scale not in sources:  # survives step-cache invalidation
            recs = scene.records("train")
            cams = scene.cameras("train", scale)
            try:
                sources[scale] = DeviceGtCache(
                    recs, cams, max_bytes=device_cache_bytes
                )
                samplers[scale] = iter(EpochSampler(len(recs), seed))
            except MemoryError:
                sources[scale] = Prefetcher(
                    recs, cams, seed=seed, workers=prefetch_workers,
                )
                samplers[scale] = None
        return steps[scale], scans.get(scale), sources[scale], samplers[scale]

    render_fn = make_render_fn(model, cfg, tcfg)
    logs: List[dict] = []
    ema = None
    t0 = time.time()
    writer = _maybe_tensorboard(cfg.model.model_path)
    save_set = set(save_iterations)
    ckpt_set = set(checkpoint_iterations)
    eval_set = frozenset(eval_iterations)

    def next_boundary(i: int) -> int:
        return chunk_boundary(
            i, iterations=iterations, steps_per_call=steps_per_call,
            log_every=log_every, eval_every=eval_every, opt=o,
            save_iterations=save_iterations,
            checkpoint_iterations=checkpoint_iterations,
            eval_iterations=eval_iterations,
        )

    gui_connected = False
    ovf_dev = bovf_dev = mfp_dev = None
    harness.live_tile_config = tcfg
    try:
        it = harness.start_iteration + 1
        while it <= iterations:
            if o.use_progressive_resolution:
                img_scale = innovations.resolution_scale_at(
                    it, o.resolution_schedule, o.resolution_milestones
                )
                div = 1.0 / img_scale
                # Evict bundles for scales that can no longer recur — each
                # holds a full-dataset device GT cache, and keeping every
                # past scale alive wastes HBM exactly when the full-res
                # cache + grown Gaussian capacity need it.
                seg = sum(1 for m in o.resolution_milestones if it >= m)
                future = {1.0 / s for s in o.resolution_schedule[seg:]}
                for d in [k for k in sources if k not in future]:
                    src = sources.pop(d)
                    if isinstance(src, Prefetcher):
                        src.close()
                    samplers.pop(d, None)
                    steps.pop(d, None)
                    scans.pop(d, None)
            else:
                div = 1.0
            step, scan_fn, source, sampler = step_for(div)
            sh_deg = active_sh_degree(it, cfg.model.sh_degree)
            debugging = 0 <= debug_from <= it
            end = it if (gui_connected or debugging) else next_boundary(it)
            if not debugging and debug_from > it:
                # Single-stepping (and finite asserts) must begin AT
                # debug_from — end the chunk one iteration before it.
                end = min(end, debug_from - 1)
            k = end - it + 1
            cams_all = scene.cameras("train", div)
            if k > 1 and scan_fn is not None and sampler is not None:
                from ..training.trainer import stack_cameras

                views = [int(next(sampler)) for _ in range(k)]
                cams = stack_cameras([jit_static_key(cams_all[v]) for v in views])
                ts = jnp.asarray([cams_all[v].timestep for v in views], jnp.int32)
                harness.state, m_all = scan_fn(
                    harness.state, source.data, jnp.asarray(views, jnp.int32),
                    cams, ts, bg, sh_deg,
                )
                overflow_seen = int(jnp.max(m_all["overflow"]))
                budget_overflow_seen = int(jnp.max(m_all["budget_overflow"]))
                mfp_seen = int(jnp.max(m_all.get(
                    "max_footprint", jnp.zeros((1,), jnp.int32))))
                # Drain any single-step accumulators (GUI-connected steps at
                # non-log iterations) so their overflow is acted on here and
                # never re-read after a budget growth.
                if ovf_dev is not None:
                    overflow_seen = max(overflow_seen, int(ovf_dev))
                if bovf_dev is not None:
                    budget_overflow_seen = max(budget_overflow_seen, int(bovf_dev))
                if mfp_dev is not None:
                    mfp_seen = max(mfp_seen, int(mfp_dev))
                ovf_dev = bovf_dev = mfp_dev = None
                metrics = jax.tree_util.tree_map(lambda x: x[-1], m_all)
                it = end
            else:
                if sampler is not None:                 # device-resident cache
                    v = int(next(sampler))
                    gt0 = source.get(v)
                else:                                   # streaming prefetcher
                    views, gt = source.next()
                    v = views[0]
                    gt0 = gt[0]
                cam = cams_all[v]
                out = step(
                    harness.state, gt0, jit_static_key(cam),
                    jnp.int32(cam.timestep), bg, sh_deg,
                )
                harness.state = out.state
                metrics = out.metrics
                # Accumulate the overflow max ON DEVICE every step (lazy, no
                # sync); host-pull only at the log cadence (a per-step scalar
                # pull costs ~ms through a TPU tunnel). An overflow at any
                # step of the window is therefore observed, as in the scan
                # path's jnp.max over the chunk.
                ovf_dev = (metrics["overflow"] if ovf_dev is None
                           else jnp.maximum(ovf_dev, metrics["overflow"]))
                bovf_dev = (metrics["budget_overflow"] if bovf_dev is None
                            else jnp.maximum(bovf_dev, metrics["budget_overflow"]))
                _m = metrics.get("max_footprint")
                if _m is not None:
                    mfp_dev = _m if mfp_dev is None else jnp.maximum(mfp_dev, _m)
                if it % log_every == 0 or it == iterations:
                    overflow_seen = int(ovf_dev)
                    budget_overflow_seen = int(bovf_dev)
                    mfp_seen = int(mfp_dev) if mfp_dev is not None else 0
                    ovf_dev = bovf_dev = mfp_dev = None
                else:
                    overflow_seen = budget_overflow_seen = mfp_seen = 0

            if gui_service is not None:
                gui_connected = bool(gui_service(it))
            if debugging:
                from ..utils.debug import assert_finite

                assert_finite(metrics, f"metrics@it{it}")
                assert_finite(harness.state.params, f"params@it{it}")

            grown = _grow_tile_budgets(
                tcfg, overflow_seen, budget_overflow_seen,
                max_footprint=mfp_seen,
                n_gauss=harness.state.params.means.shape[0],
                sorted_mode=cfg.pipeline.use_sorted and cfg.pipeline.use_pallas,
            )
            if grown is not None:
                tcfg = grown
                harness.live_tile_config = tcfg
                steps.clear(); scans.clear()
                render_fn = make_render_fn(model, cfg, tcfg)

            if it % log_every == 0 or it == iterations:
                loss = float(metrics["loss"])
                ema = loss if ema is None else 0.6 * ema + 0.4 * loss
                rec = {
                    "iteration": it,
                    "loss": loss,
                    "ema_loss": ema,
                    "psnr": float(metrics["psnr"]),
                    "num_points": int(num_alive(harness.state.aux)),
                    "elapsed_s": time.time() - t0,
                }
                logs.append(rec)
                if writer:
                    for k in ("loss", "psnr"):
                        writer.add_scalar(f"train/{k}", rec[k], it)
                    writer.add_scalar("train/num_points", rec["num_points"], it)
                print(
                    f"[{it}/{iterations}] loss={loss:.5f} ema={ema:.5f} "
                    f"psnr={rec['psnr']:.2f} pts={rec['num_points']}"
                )
                if on_step:
                    on_step(it, rec)

            _post_step_events(
                # `it` may have advanced to the chunk end — recompute sh_deg
                # for the event/eval calls rather than reusing the chunk's.
                harness, it, active_sh_degree(it, cfg.model.sh_degree),
                writer=writer, render_fn=render_fn, eval_every=eval_every,
                eval_views=eval_views, bg=bg,
                save_set=save_set, ckpt_set=ckpt_set, eval_set=eval_set,
            )
            it += 1
    finally:
        for src_ in sources.values():
            if isinstance(src_, Prefetcher):
                src_.close()
        if writer:
            writer.close()
    return logs


def train_sharded(
    harness: TrainerHarness,
    mesh,
    iterations: Optional[int] = None,
    log_every: int = 100,
    eval_every: Optional[int] = None,
    save_iterations: Sequence[int] = (),
    checkpoint_iterations: Sequence[int] = (),
    eval_iterations: Sequence[int] = (),
    eval_views: int = 4,
    gauss_shard: bool = False,
    seed: int = 0,
    device_cache_bytes: int = 4 << 30,
    on_step: Optional[Callable[[int, dict], None]] = None,
    gui_service: Optional[Callable[[int], bool]] = None,
    debug_from: int = -1,
) -> List[dict]:
    """Multi-chip training driver over a ('data', 'tile') jax mesh.

    Each step trains `mesh.shape['data']` cameras (one per data-group) with
    compositing split over 'tile' row bands (optionally per-splat geometry
    too, `gauss_shard` — parallel/sharded.py). State stays replicated, so
    densify / opacity-reset / eval / save reuse the single-chip events at
    the same cadences. One dispatch per step — intended for locally
    attached pods (collectives amortise per-chip work); through a tunnel
    use `train()`'s scan chunking instead.

    Full option parity with `train()`: the five training innovations
    (progressive resolution included — each image scale gets its own
    compiled step/GT-cache bundle) and the laplacian loss all run here,
    with exact single-chip equivalence asserted in tests/test_sharded.py.
    """
    from ..parallel.sharded import (
        camera_batch, make_sharded_train_step, pad_gt_for_mesh, padded_height,
    )

    cfg, scene, model = harness.cfg, harness.scene, harness.model
    o = cfg.opt
    iterations = iterations if iterations is not None else o.iterations
    tcfg = tile_config(cfg)
    _train_cams = scene.cameras("train", 1.0)
    if _train_cams:
        from ..parallel.distributed import is_coordinator as _is_coord

        # Full-frame probe — a safe upper bound for the per-band footprints
        # each tile-device actually bins.
        tcfg = probe_tier_budgets(
            tcfg, cfg, model, harness.state, _train_cams[0],
            verbose=_is_coord(),
        )
    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
    )
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    recs = scene.records("train")

    # Per-resolution-scale bundles (progressive resolution swaps the whole
    # static geometry: cameras, padded height, GT cache, compiled step).
    # Steps cache separately from data so overflow recovery can rebuild the
    # compiled step without resetting samplers or re-uploading GT.
    step_cache: Dict[float, Callable] = {}
    data_cache: Dict[float, tuple] = {}

    def bundle_for(div: float):
        if div not in data_cache:
            cams_d = scene.cameras("train", div)
            template_d = jit_static_key(cams_d[0])
            try:
                source_d = DeviceGtCache(recs, cams_d, max_bytes=device_cache_bytes)
                fetch = lambda views, s=source_d: s.data[jnp.asarray(views, jnp.int32)]
            except MemoryError:
                print("[info] dataset exceeds the device GT cache budget — "
                      "streaming views from host per step")
                fetch = lambda views, c=cams_d: jnp.asarray(
                    np.stack([load_view(recs[v], c[v]) for v in views])
                )
            sampler_d = iter(EpochSampler(len(cams_d), seed=seed))
            data_cache[div] = (fetch, cams_d, template_d, sampler_d)
        fetch, cams_d, template_d, sampler_d = data_cache[div]
        if div not in step_cache:
            step_cache[div] = make_sharded_train_step(
                model, cfg, tcfg, mesh, template_d,
                spatial_lr_scale=harness.spatial_lr_scale, gauss_shard=gauss_shard,
            )
        hp_d = padded_height(template_d.height, tcfg.tile_h, n_tile)
        return step_cache[div], fetch, cams_d, hp_d, sampler_d

    from ..parallel.distributed import (
        is_coordinator, local_data_rows, make_global_batch,
    )

    coord = is_coordinator()
    multiproc = jax.process_count() > 1
    local_rows = local_data_rows(mesh) if multiproc else list(range(n_data))
    render_fn = make_render_fn(model, cfg, tcfg)
    harness.live_tile_config = tcfg
    ovf_dev = bovf_dev = mfp_dev = None
    writer = _maybe_tensorboard(cfg.model.model_path) if coord else None
    logs: List[dict] = []
    ema = None
    t0 = time.time()
    save_set = set(save_iterations)
    ckpt_set = set(checkpoint_iterations)
    eval_set = frozenset(eval_iterations)

    try:
        for it in range(harness.start_iteration + 1, iterations + 1):
            sh_deg = active_sh_degree(it, cfg.model.sh_degree)
            if o.use_progressive_resolution:
                div = 1.0 / innovations.resolution_scale_at(
                    it, o.resolution_schedule, o.resolution_milestones
                )
                # Evict unreachable scales (each holds a full GT cache).
                seg = sum(1 for m in o.resolution_milestones if it >= m)
                future = {1.0 / s for s in o.resolution_schedule[seg:]}
                for d in [k for k in data_cache if k not in future]:
                    data_cache.pop(d)
                    step_cache.pop(d, None)
            else:
                div = 1.0
            step, fetch, cams_all, hp, sampler = bundle_for(div)
            views = [int(next(sampler)) for _ in range(n_data)]
            # camera_batch extracts only traced arrays (incl. timestep and
            # per-view fovs), so raw cameras are fine here; static sizes
            # come from the scale's template. GT ships in the cache dtype
            # (uint8 = 4x less reshard traffic); the step converts on device.
            cams = camera_batch([cams_all[v] for v in views])
            if multiproc:
                # The sampler is seed-deterministic, so every process draws
                # the same view list; each fetches GT only for the data rows
                # its devices own and contributes them to a global array.
                gt_local = np.asarray(
                    pad_gt_for_mesh(fetch([views[r] for r in local_rows]), hp)
                )
                cams, gt = make_global_batch(mesh, cams, gt_local, local_rows)
            else:
                gt = pad_gt_for_mesh(fetch(views), hp)
            harness.state, metrics = step(
                harness.state, cams, gt, bg, sh_degree=sh_deg
            )
            # Overflow max accumulates ON DEVICE every step (lazy, no host
            # sync); pulled at the log cadence below. Metrics are
            # mesh-reduced (replicated), so every process observes the same
            # values and recompiles to the same budgets.
            ovf_dev = (metrics["overflow"] if ovf_dev is None
                       else jnp.maximum(ovf_dev, metrics["overflow"]))
            _b = metrics.get("budget_overflow")
            if _b is not None:
                bovf_dev = _b if bovf_dev is None else jnp.maximum(bovf_dev, _b)
            _m = metrics.get("max_footprint")
            if _m is not None:
                mfp_dev = _m if mfp_dev is None else jnp.maximum(mfp_dev, _m)

            if gui_service is not None:
                gui_service(it)
            if 0 <= debug_from <= it:
                from ..utils.debug import assert_finite

                assert_finite(metrics, f"metrics@it{it}")
                assert_finite(harness.state.params, f"params@it{it}")

            if it % log_every == 0 or it == iterations:
                loss = float(metrics["loss"])
                ema = loss if ema is None else 0.6 * ema + 0.4 * loss
                rec = {
                    "iteration": it, "loss": loss, "ema_loss": ema,
                    "psnr": float(metrics["psnr"]),
                    "num_points": int(num_alive(harness.state.aux)),
                    "elapsed_s": time.time() - t0,
                }
                logs.append(rec)
                if coord:
                    print(f"[{it}/{iterations}] loss={loss:.5f} ema={ema:.5f} "
                          f"psnr={rec['psnr']:.2f} pts={rec['num_points']}")
                if writer:
                    for k in ("loss", "psnr", "num_points"):
                        writer.add_scalar(f"train/{k}", rec[k], it)
                if on_step:
                    on_step(it, rec)
                grown = _grow_tile_budgets(
                    tcfg,
                    int(ovf_dev) if ovf_dev is not None else 0,
                    int(bovf_dev) if bovf_dev is not None else 0,
                    verbose=coord,
                    max_footprint=int(mfp_dev) if mfp_dev is not None else 0,
                    n_gauss=harness.state.params.means.shape[0],
                    sorted_mode=cfg.pipeline.use_sorted and cfg.pipeline.use_pallas,
                )
                ovf_dev = bovf_dev = mfp_dev = None
                if grown is not None:
                    tcfg = grown
                    harness.live_tile_config = tcfg
                    step_cache.clear()
                    render_fn = make_render_fn(model, cfg, tcfg)

            _post_step_events(
                harness, it, sh_deg,
                writer=writer, render_fn=render_fn, eval_every=eval_every,
                eval_views=eval_views, bg=bg,
                save_set=save_set, ckpt_set=ckpt_set, eval_set=eval_set,
                coordinator=coord,
            )
    finally:
        if writer:
            writer.close()
    return logs


def _maybe_tensorboard(model_path: str):
    if not model_path:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(model_path)
    except Exception:
        return None
