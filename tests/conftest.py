"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is tested without a TPU slice by forcing the host
platform to expose 8 virtual devices (the standard JAX pattern; XLA collectives
run identically on virtual devices). See SURVEY.md §4.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough on machines whose sitecustomize registers an
# accelerator plugin before conftest runs — pin the platform via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
