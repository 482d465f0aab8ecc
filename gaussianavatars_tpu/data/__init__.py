"""Datasets, cameras, and checkpoint/PLY I/O."""
