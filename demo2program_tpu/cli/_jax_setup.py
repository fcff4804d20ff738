"""Common JAX runtime setup for CLI entry points.

Enables the persistent compilation cache (the 512-unit train step takes
minutes to compile on the TPU's remote-compile path; cached reruns start in
seconds).
"""

import os

import jax


def setup():
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_demo2program"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these config names
