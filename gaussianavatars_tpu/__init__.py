"""gaussianavatars_tpu — a TPU-native framework for rigged-3D-Gaussian head avatars.

A from-scratch JAX/XLA/Pallas re-design (NOT a port) of the capabilities of
GaussianAvatars (CVPR 2024): differentiable tile-binned Gaussian splatting,
FLAME linear-blend-skinning mesh binding, adaptive densification, the five
training innovations, and multi-chip sharded execution over a TPU mesh.

Design stance (see SURVEY.md §7): a functional core where all model state is a
pytree stepped by jitted pure functions; densification is a shape event on
fixed-capacity padded buffers with an alive mask; sharding is expressed once
via a device mesh with axes ``(data, gauss, tile)`` so single-chip and
multi-host runs are the same code.
"""

__version__ = "0.1.0"
