"""Persistent XLA compilation cache.

The TPU in this environment compiles through a remote tunnel where large
programs take tens of minutes; caching compiled executables on disk makes
repeat runs (benchmarks, resumed training, CI) start in seconds."""

import logging
import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_persistent_cache(cache_dir=None):
    import jax

    cache_dir = cache_dir or os.environ.get("FOCAL_JAX_CACHE", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax or read-only fs: non-fatal
        logging.info(f"persistent compilation cache unavailable: {e}")
