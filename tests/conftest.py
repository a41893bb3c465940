"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective paths
are validated on XLA's host-platform virtual devices instead.

NOTE: jax is already imported by the time conftest runs (pytest's plugin
loading pulls it in), so JAX_PLATFORMS must be overridden via jax.config, not
os.environ. XLA_FLAGS is still read lazily at backend init, so the virtual
device count can be set through the environment here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
