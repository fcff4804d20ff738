"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(parallel/mesh.py, train-step pjit) is exercised without TPU hardware —
the JAX-native way to test a mesh (SURVEY.md §4).

Must run before jax initializes its backends, hence env vars set at import.
"""

import os

# FORCE cpu (the ambient environment pins JAX_PLATFORMS=axon — a real TPU —
# which would both hog the chip and silently shrink the virtual 8-device mesh
# to 1 device)
os.environ["JAX_PLATFORMS"] = "cpu"
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

# The ambient axon sitecustomize force-registers the TPU backend and
# overrides JAX_PLATFORMS, so the env var alone is not enough — pin the
# platform through the config API (this is what actually wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, (
    "tests require the 8-device virtual CPU mesh; got "
    f"{jax.devices()}")


def pytest_configure(config):
    # test tiering (VERDICT r3 weak #5): `pytest -m "not slow"` is the
    # fast gate (~2 min on the 1-core host); the full suite runs the heavy
    # model-stack / trainer-e2e compiles too
    config.addinivalue_line(
        "markers",
        "slow: heavy model/e2e tests (deselect with -m 'not slow')")
