"""Checkpointing with orbax.

Keeps the reference's best/latest UX (reference: output_paths.py:165-199,
pretrain.py:94-100) but saves the FULL train state (params, BatchNorm stats,
optimizer state, step) so runs are resumable — the reference only saves
weights. Pretrain checkpoints additionally keep a params+batch_stats-only
view for finetune loading, mirroring "backbone only" saves.
"""

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _meta_path(path):
    # sidecar next to (not inside) the orbax dir — orbax owns the dir contents
    return os.path.abspath(path).rstrip("/") + ".meta.json"


def save_state(path, state, extra=None, meta=None):
    """Save a TrainState (or any pytree) to `path` (a directory).

    `meta` is a small JSON-able dict of run settings that shape the opt_state
    pytree (e.g. grad_accum); it is written to a sidecar file and validated on
    restore so a mismatched -resume fails with an actionable message instead
    of a raw orbax tree-structure error."""
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": np.asarray(state.step),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(_meta_path(path), "w") as f:
            json.dump(meta, f)


def check_meta(path, expected):
    """Compare a checkpoint's sidecar meta against the live run's settings.

    Raises ValueError on mismatch. Silently passes when no sidecar exists
    (checkpoints from older versions)."""
    mp = _meta_path(path)
    if not os.path.exists(mp):
        return
    with open(mp) as f:
        saved = json.load(f)
    for key, want in expected.items():
        if key in saved and saved[key] != want:
            raise ValueError(
                f"Checkpoint {path} was saved with {key}={saved[key]} but this "
                f"run uses {key}={want}; the optimizer-state structure differs. "
                f"Pass -{key} {saved[key]} to resume, or start a fresh run."
            )


def save_params(path, params, batch_stats=None):
    """Backbone-only save (reference pretrain saves backbone state_dict only)."""
    payload = {"params": _to_host(params), "batch_stats": _to_host(batch_stats or {})}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def restore(path):
    """Restore whatever pytree was saved at `path`."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_state(path, state, extra_template=None):
    """Restore a full TrainState saved by save_state, preserving the live
    state's pytree structure (opt_state namedtuples etc.).

    Returns (state, extra). The reference has no mid-run resume at all
    (SURVEY §5: optimizer state and epoch are never saved); this is a
    framework addition."""
    target = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": np.asarray(state.step),
    }
    if extra_template is not None:
        target["extra"] = extra_template
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
    return new_state, restored.get("extra")


def load_params_into(state, path, load_class_layer=True):
    """Partial-load checkpoint params into a TrainState, optionally excluding
    the classifier head (reference: weight_utils.py:9-25)."""
    saved = restore(path)
    saved_params = saved["params"]
    saved_stats = saved.get("batch_stats", {})

    def merge(current, incoming, drop_class):
        out = {}
        for key, cur in current.items():
            if drop_class and "class_layer" in str(key):
                out[key] = cur
            elif key in incoming:
                inc = incoming[key]
                out[key] = merge(cur, inc, drop_class) if isinstance(cur, dict) else inc
            else:
                out[key] = cur
        return out

    new_params = merge(dict(state.params), dict(saved_params), not load_class_layer)
    new_stats = merge(dict(state.batch_stats), dict(saved_stats), False) if saved_stats else state.batch_stats
    return state.replace(params=new_params, batch_stats=new_stats)
