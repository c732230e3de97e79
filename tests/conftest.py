"""Test configuration: run the whole suite on an 8-device virtual CPU platform.

Multi-chip sharding is exercised on a virtual CPU mesh
(xla_force_host_platform_device_count=8), per the test strategy in SURVEY.md §4.

Two situations must both work:
  * Plain invocation: no backend initialized yet -> JAX_PLATFORMS=cpu wins.
  * This machine's default env initializes a remote-TPU PJRT backend eagerly at
    interpreter startup (sitecustomize), *before* conftest runs.  Then
    JAX_PLATFORMS can no longer be changed, but the CPU client is still
    uninitialized — XLA_FLAGS set here applies when it comes up, and pinning
    jax_default_device to cpu:0 routes all uncommitted computation to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

cpu_devices = jax.devices("cpu")
assert len(cpu_devices) == 8, f"expected 8 virtual CPU devices, got {len(cpu_devices)}"
jax.config.update("jax_default_device", cpu_devices[0])
