"""Pallas TPU kernels for the hot rasterizer path."""
from .composite import composite_tiles_pallas, make_pallas_compositor

__all__ = ["composite_tiles_pallas", "make_pallas_compositor"]
