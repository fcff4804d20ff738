"""Common JAX runtime setup for CLI entry points.

Enables the persistent compilation cache (the 512-unit train step takes
minutes to compile on the TPU's remote-compile path; cached reruns start in
seconds).
"""

import os

import jax


def setup():
    # honor an explicit JAX_PLATFORMS request through the config API: the
    # ambient axon sitecustomize force-registers the TPU backend and would
    # otherwise override the env var, so `JAX_PLATFORMS=cpu <cli>` could
    # silently grab the (single-tenant) TPU
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_demo2program"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these config names
