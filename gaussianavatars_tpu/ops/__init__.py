"""Compute ops: quaternions, spherical harmonics, projection, rasterization."""
