"""Typed configuration tree.

Same knob names and defaults as the reference's reflection-based argparse
system (`arguments/__init__.py:47-144`) for recipe parity, but as plain frozen
dataclasses — serialisable to/from JSON for `cfg_args`-style provenance and
usable directly as static jit arguments.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """`ModelParams` equivalent (`arguments/__init__.py:47-67`)."""

    source_path: str = ""
    model_path: str = ""
    sh_degree: int = 3
    bind_to_mesh: bool = True
    white_background: bool = False
    resolution: int = -1
    data_device: str = "tpu"
    eval: bool = True
    target_path: str = ""
    select_camera_id: int = -1
    # TPU-native additions:
    capacity: int = 131072          # padded Gaussian capacity
    n_shape: int = 300
    n_expr: int = 100
    add_teeth: bool = True


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """`PipelineParams` equivalent (`arguments/__init__.py:69-74`)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    # Rasterizer geometry (TPU-native):
    tile_h: int = 32
    tile_w: int = 32
    capacity_per_tile: int = 1024
    max_tiles_per_gaussian: int = 16
    use_pallas: bool = True         # pallas kernels on TPU, scan fallback elsewhere
    # Sorted-data pipeline (ops/rasterize_sorted.py) — the production
    # path: screen params ride the binning sort (no gather), tiered
    # budgets bound the expansion, backward reduces by contiguous slice
    # adds. False falls back to the portable table + lax.scan compositor.
    use_sorted: bool = True
    # Tiered budgets for the sorted pipeline: every Gaussian gets
    # `base_budget` expansion slots; each (count, budget) tier gives the
    # `count` footprint-heaviest Gaussians slots up to `budget`. Empty =
    # auto-sized from the padded Gaussian count (sort_binning.default_tiers);
    # the training loop grows tiers on budget overflow.
    base_budget: int = 2
    tiers: Tuple[Tuple[int, int], ...] = ()


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """`OptimizationParams` equivalent (`arguments/__init__.py:76-144`).

    Identical defaults: the canonical 600k-iteration recipe.
    """

    iterations: int = 600_000
    position_lr_init: float = 0.005
    position_lr_final: float = 0.00005
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 600_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.017
    rotation_lr: float = 0.001
    densification_interval: int = 2_000
    opacity_reset_interval: int = 60_000
    densify_from_iter: int = 10_000
    densify_until_iter: int = 600_000
    densify_grad_threshold: float = 0.0002

    flame_expr_lr: float = 1e-3
    flame_trans_lr: float = 1e-6
    flame_pose_lr: float = 1e-5
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    lambda_xyz: float = 1e-2
    threshold_xyz: float = 1.0
    metric_xyz: bool = False
    lambda_scale: float = 1.0
    threshold_scale: float = 0.6
    metric_scale: bool = False
    lambda_dynamic_offset: float = 0.0
    lambda_laplacian: float = 0.0
    lambda_dynamic_offset_std: float = 0.0

    use_amp: bool = False  # on TPU: bf16 compute policy (no GradScaler needed)

    # Innovation 1: region-adaptive loss
    use_region_adaptive_loss: bool = False
    region_weight_eyes: float = 2.0
    region_weight_mouth: float = 2.0
    region_weight_nose: float = 1.5
    region_weight_face: float = 1.2

    # Innovation 2: smart densification
    use_smart_densification: bool = False
    densify_percentile_clone: float = 75.0
    densify_percentile_split: float = 90.0

    # Innovation 3: progressive resolution
    use_progressive_resolution: bool = False
    resolution_schedule: Tuple[float, ...] = (0.5, 0.75, 1.0)
    resolution_milestones: Tuple[int, ...] = (100_000, 300_000)

    # Innovation 4: color calibration network
    use_color_calibration: bool = False
    color_net_hidden_dim: int = 16
    color_net_layers: int = 3
    color_net_lr: float = 1e-3      # reference: Adam(lr=1e-3), train.py:94
    lambda_color_reg: float = 1e-4

    # Innovation 5: contrastive regularization
    use_contrastive_reg: bool = False
    lambda_contrastive: float = 0.01
    contrastive_cache_size: int = 2
    contrastive_downsample: int = 8


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout (no reference equivalent — SURVEY.md §2.5)."""

    data_axis: int = 1    # cameras per step replicated/split over `data`
    gauss_axis: int = 1   # Gaussian shards over `gauss` (projection/binning)
    tile_axis: int = 1    # image-tile shards over `tile` (compositing)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    pipeline: PipelineConfig = PipelineConfig()
    opt: OptimizationConfig = OptimizationConfig()
    parallel: ParallelConfig = ParallelConfig()


def to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def from_json(text: str) -> Config:
    raw = json.loads(text)

    def build(cls, d):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                continue
            t = fields[k].type
            if isinstance(v, list):
                v = tuple(
                    tuple(x) if isinstance(x, list) else x for x in v
                )
            kw[k] = v
        return cls(**kw)

    return Config(
        model=build(ModelConfig, raw.get("model", {})),
        pipeline=build(PipelineConfig, raw.get("pipeline", {})),
        opt=build(OptimizationConfig, raw.get("opt", {})),
        parallel=build(ParallelConfig, raw.get("parallel", {})),
    )
