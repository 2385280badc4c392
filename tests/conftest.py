"""Test configuration: run on CPU with 8 virtual devices (multi-chip sharding
tests) and float64 enabled (oracle-parity tests drive the same code paths in
f64; the library itself defaults to f32).

Note: the env may pre-register a TPU PJRT plugin via sitecustomize and set
JAX_PLATFORMS before this file runs, so the platform must be forced through
jax.config (mutating os.environ["JAX_PLATFORMS"] here would be too late).
Set DEEPCGP_TEST_PLATFORM to override (e.g. to smoke-test on a real TPU).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms",
                  os.environ.get("DEEPCGP_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
