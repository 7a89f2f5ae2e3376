"""Dataset recipe loading.

Resolution order for ``{dataset}.yaml``:
  1. an explicit ``-dataset_config`` path,
  2. ``./data/{dataset}.yaml`` relative to the CWD (reference layout,
     reference: src/params/params_util.py:118-120),
  3. the recipes packaged under ``focal_tpu/configs/``.
"""

import os

import yaml

_PACKAGED_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def load_yaml(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def resolve_dataset_yaml(dataset, explicit_path=None):
    """Find the recipe file for a dataset name."""
    candidates = []
    if explicit_path:
        candidates.append(explicit_path)
    candidates.append(os.path.join(".", "data", f"{dataset}.yaml"))
    candidates.append(os.path.join(_PACKAGED_CONFIG_DIR, f"{dataset}.yaml"))
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"No dataset recipe found for '{dataset}'. Looked at: {candidates}"
    )


def load_dataset_config(dataset, explicit_path=None):
    return load_yaml(resolve_dataset_yaml(dataset, explicit_path))
