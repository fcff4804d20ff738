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
# persistent compile cache: the model-stack scans are expensive to compile on
# CPU; caching cuts repeat suite runs from ~10min to seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_d2p_tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
