"""Shared rasterizer test fixtures: a deterministic random splat scene and
its screen-space projection (formerly in test_rasterize_pairs.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatars_tpu.data.cameras import look_at_camera
from gaussianavatars_tpu.ops.projection import project_from_params
from gaussianavatars_tpu.ops.rasterize_tiled import TileConfig

H, W = 64, 96
CFG = TileConfig(tile_h=8, tile_w=16, capacity=64, max_tiles_per_gaussian=16)


def make_scene(n=200, seed=0, opac_lo=0.2, opac_hi=0.9):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jax.random.normal(k1, (n, 3)) * jnp.array([0.8, 0.6, 0.3]) + jnp.array(
        [0.0, 0.0, 2.5]
    )
    scales = jax.random.uniform(k2, (n, 3), minval=0.01, maxval=0.12)
    quats = jax.random.normal(k3, (n, 4))
    opacity = jax.random.uniform(k4, (n,), minval=opac_lo, maxval=opac_hi)
    colors = jax.random.uniform(k5, (n, 3))
    cam = look_at_camera(
        eye=np.array([0.0, 0.0, 0.0]), target=np.array([0.0, 0.0, 2.5]),
        fovy=1.0, width=W, height=H,
    )
    return means, scales, quats, opacity, colors, cam


def screen_inputs(scene, cfg=CFG):
    means, scales, quats, opacity, colors, cam = scene
    proj = project_from_params(means, scales, quats, cam)
    opac = jnp.where(proj.mask, opacity, 0.0)
    return proj, opac, colors, cam
