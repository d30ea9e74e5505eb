"""Test configuration: force a CPU backend with 8 virtual devices so multi-chip
sharding tests (SURVEY.md §4 implication) run anywhere, and enable x64 to match the
reference's float64 CPU test fixtures (tests/test_mppi.py:15-17)."""
import os

# The environment may preset JAX_PLATFORMS=axon (single real TPU chip) and a
# sitecustomize hook may import jax at interpreter startup — so setting the env
# var here can be too late. XLA_FLAGS is still read lazily at first backend
# init, and `jax.config.update` works after import as long as no backend has
# been resolved yet. Unit tests always run on the 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
