"""Multi-chip execution: device mesh, sharded render/train over (data, tile)."""

from .mesh import make_device_mesh  # noqa: F401
