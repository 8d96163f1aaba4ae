"""Test configuration: CPU backend with 8 virtual devices + f64.

Mirrors the reference test strategy (reference: tst/run_test_suite.py) of
running the full production path on CPU; the 8-device virtual mesh exercises
the block-axis sharding the driver validates separately on real hardware.

Note: the env-var JAX_PLATFORMS is not sufficient here (the axon TPU plugin
overrides it); jax.config.update('jax_platforms', ...) before first backend
use is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
