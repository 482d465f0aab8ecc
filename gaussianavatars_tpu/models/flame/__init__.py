"""FLAME 2023 head model in pure JAX: assets, LBS, masks, teeth, binding."""

from .assets import FlameAssets, load_assets, synthetic_assets  # noqa: F401
from .flame_model import FlameModel, FlameConfig  # noqa: F401
