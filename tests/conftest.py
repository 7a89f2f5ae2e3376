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
