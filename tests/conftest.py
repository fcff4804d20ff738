"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(parallel/mesh.py, train-step pjit) is exercised without TPU hardware —
the JAX-native way to test a mesh (SURVEY.md §4).

Must run before jax initializes its backends, hence env vars set at import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
