"""Test configuration: force the CPU backend with 8 virtual devices.

The test pyramid runs entirely on a simulated 8-device mesh
(`--xla_force_host_platform_device_count=8`) so sharding/DP logic is testable
without a TPU pod, per SURVEY.md §4.  The axon TPU plugin (if present) pins
`jax_platforms`, so we override it via jax.config, not just the env var.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
