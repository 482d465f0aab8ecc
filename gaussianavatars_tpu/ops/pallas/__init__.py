"""Pallas TPU kernels: the sorted-pipeline compositors (composite_pairs)."""
from .composite_pairs import bwd_call_pairs, fwd_call_pairs

__all__ = ["bwd_call_pairs", "fwd_call_pairs"]
