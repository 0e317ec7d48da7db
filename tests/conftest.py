"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware, and with x64 for parity checks.

NOTE: on this image the axon TPU plugin ignores the ``JAX_PLATFORMS`` env
var, so the config flag must be set explicitly — otherwise tests silently
run on the tunneled TPU where float64 is range-limited emulation.
"""

import os

# Must be set before jax initializes backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"
