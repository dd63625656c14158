"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference CI strategy (SURVEY.md §4): tiny random models on CPU;
distributed correctness exercised via virtual devices instead of real chips.

The container boots with JAX_PLATFORMS=axon (a real-TPU tunnel) and a
sitecustomize that imports jax early, so env vars alone are too late — we
must update jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # never run unit tests against the TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
