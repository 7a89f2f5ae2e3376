"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# a sitecustomize on this machine re-exports JAX_PLATFORMS after the shell env;
# the config API wins over both
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: most of the suite's wall time is XLA compiles
# of the same jitted programs run-over-run (VERDICT round-3 item 8 — the
# "fast" subset paid full 8-device mesh compiles every invocation). Keyed by
# optimized-HLO hash, so code changes invalidate exactly the programs they
# touch. The directory is suffixed per-host (utils/cache.py): XLA:CPU AOT
# artifacts from a different machine mis-load and can deadlock the
# multi-process gloo tests. Override the root with FOCAL_TEST_CACHE; set it
# empty to disable.
_cache = os.environ.get("FOCAL_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache"))
if _cache:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from focal_tpu.utils.cache import cache_dir_for_host

    jax.config.update("jax_compilation_cache_dir", cache_dir_for_host(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mod_config():
    from focal_tpu.params.yaml_utils import load_dataset_config

    return load_dataset_config("MOD")


def _args(**overrides):
    """Build a parsed+derived args namespace in a temp cwd-independent way."""
    from focal_tpu.params.cli import build_parser
    from focal_tpu.params.auto import set_auto_params

    argv = overrides.pop("argv", [])
    args = build_parser().parse_args(argv)
    args.option = overrides.pop("option", "train")
    for k, v in overrides.items():
        setattr(args, k, v)
    return set_auto_params(args)


@pytest.fixture
def make_args(tmp_path, monkeypatch):
    def _make(**overrides):
        overrides.setdefault("output_dir", str(tmp_path))
        overrides.setdefault("synthetic", True)
        overrides.setdefault("synthetic_samples", 64)
        return _args(**overrides)

    return _make
