"""Persistent XLA compilation cache.

The TPU in this environment compiles through a remote tunnel where large
programs take tens of minutes; caching compiled executables on disk makes
repeat runs (benchmarks, resumed training, CI) start in seconds.

The cache directory is suffixed with a HOST FINGERPRINT (CPU feature flags):
XLA:CPU caches AOT-compiled machine code keyed only by HLO, so artifacts
written on one machine load on another with different CPU features — logged
as `cpu_aot_loader` feature-mismatch errors and observed here to deadlock
multi-process gloo collectives and silently fall off the fast path. A new
host gets a fresh (empty) cache instead of a poisoned one.
"""

import hashlib
import logging
import os

DEFAULT_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def host_fingerprint():
    """Short stable hash of this machine's CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


def cache_dir_for_host(root):
    return os.path.join(root, host_fingerprint())


def enable_persistent_cache(cache_dir=None):
    import jax

    root = cache_dir or os.environ.get("FOCAL_JAX_CACHE", DEFAULT_CACHE_ROOT)
    cache_dir = cache_dir_for_host(root)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax or read-only fs: non-fatal
        logging.info(f"persistent compilation cache unavailable: {e}")


def disable_for_multiprocess_cpu():
    """Turn the persistent cache OFF for multi-process CPU runs.

    XLA:CPU serializes AOT machine code whose cache key does not capture the
    gloo process topology: executables cached by a single-process (or
    differently-sized) run load into a multi-process run and deadlock the
    collective rendezvous (observed: 2-proc CLI e2e hangs with a warm cache,
    passes with a cold one; `cpu_aot_loader` feature-mismatch errors in the
    logs). Multi-process CPU is a test topology — compiles are cheap — so the
    cache buys nothing there. TPU executables are not affected; the TPU path
    keeps the cache (it exists for the tunneled TPU's slow compiles).
    """
    import jax

    if jax.default_backend() != "cpu" or jax.process_count() <= 1:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        logging.info("= persistent compile cache disabled (multi-process CPU topology)")
    except Exception as e:
        logging.info(f"could not disable persistent cache: {e}")
