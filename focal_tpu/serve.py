"""Serving / batch-inference path.

The reference stops at an evaluation CLI (src/test.py:16-58 — labeled test
split, metrics only). This module is the production-serving surface beyond
it: load a trained checkpoint, AOT-compile a fixed-batch classifier forward
(augmenter "no" pipeline -> FFT -> backbone -> logits), and run arbitrary
(possibly unlabeled) sample batches through it with padding on the ragged
tail and per-batch latency accounting.

TPU notes: the forward is compiled ONCE for a fixed [B, c, i, s] shape via
jax.jit(...).lower(...).compile() — serving never retraces; ragged final
batches are padded by repeating the last row and sliced after. Probabilities
are computed on device; only [B, num_classes] crosses back per batch.
"""

import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from focal_tpu.data.dataset import _load_sample_file


class Predictor:
    """Checkpoint -> compiled fixed-batch classifier.

    Args:
      args: derived CLI namespace (parse_test_params); uses the recipe for
        shapes, `classifier_weight`/`model_weight` for the checkpoint and
        `batch_size` for the compiled batch.
      checkpoint: optional explicit checkpoint dir (overrides args).
    """

    def __init__(self, args, checkpoint=None):
        import optax

        from focal_tpu.models import build_backbone
        from focal_tpu.ops import build_augmenter
        from focal_tpu.train import checkpoint as ckpt
        from focal_tpu.train.state import init_state

        self.args = args
        self.task = args.task
        cfg = args.dataset_config
        self.batch_size = int(args.batch_size or 128)
        self.num_classes = cfg[args.task]["num_classes"]
        self.model = build_backbone(args)
        self.augmenter = build_augmenter(args)

        # sample-shape template from the recipe (time domain [c, i, s])
        self._template = {}
        for loc in cfg["location_names"]:
            self._template[loc] = {}
            for mod in cfg["loc_modalities"][loc]:
                if mod not in cfg["loc_mod_spectrum_len"][loc]:
                    continue
                c = cfg["loc_mod_in_time_channels"][loc][mod]
                i = cfg["num_segments"]
                s = cfg["loc_mod_spectrum_len"][loc][mod]
                self._template[loc][mod] = (c, i, s)

        dummy = self._zeros_batch(2)
        sample = self.augmenter.no(dummy)
        state = init_state(args, self.model, sample, optax.identity(), jax.random.key(args.seed))
        path = checkpoint or getattr(args, "classifier_weight", None) or args.model_weight
        if not path:
            raise ValueError("No checkpoint: pass -model_weight or use a prior experiment folder")
        self.checkpoint_path = path
        state = ckpt.load_params_into(state, path, load_class_layer=True)
        self.variables = jax.device_put({"params": state.params, "batch_stats": state.batch_stats})

        def fwd(variables, batch):
            freq_x = self.augmenter.no(batch)
            logits = self.model.apply(variables, freq_x, train=False, head="class")
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        t0 = time.time()
        struct = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.variables
        )
        batch_struct = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._zeros_batch(self.batch_size)
        )
        self._compiled = jax.jit(fwd).lower(struct, batch_struct).compile()
        self.compile_seconds = time.time() - t0

    def _zeros_batch(self, b):
        return {
            loc: {m: jnp.zeros((b,) + shp, jnp.float32) for m, shp in mods.items()}
            for loc, mods in self._template.items()
        }

    def predict(self, data):
        """data: {loc: {mod: [N, c, i, s]}} host or device arrays.

        Returns dict with "probs" [N, num_classes] f32, "preds" [N] int,
        and latency stats (seconds per batch: mean/p50/p99, windows_per_s;
        excludes compile, includes H2D + D2H).
        """
        n = next(iter(next(iter(data.values())).values())).shape[0]
        B = self.batch_size
        probs = np.empty((n, self.num_classes), np.float32)
        lat = []
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            batch = jax.tree_util.tree_map(lambda a: np.asarray(a[lo:hi]), data)
            if hi - lo < B:  # pad the ragged tail by repeating the last row
                pad = B - (hi - lo)
                batch = jax.tree_util.tree_map(
                    lambda a: np.concatenate([a, np.repeat(a[-1:], pad, axis=0)]), batch
                )
            t0 = time.time()
            out = self._compiled(self.variables, jax.device_put(batch))
            out = np.asarray(jax.device_get(out))
            lat.append(time.time() - t0)
            probs[lo:hi] = out[: hi - lo]
        lat = np.asarray(lat)
        return {
            "probs": probs,
            "preds": probs.argmax(-1).astype(np.int32),
            "latency": {
                "batch_size": B,
                "batches": int(lat.size),
                "mean_s": float(lat.mean()),
                "p50_s": float(np.percentile(lat, 50)),
                "p99_s": float(np.percentile(lat, 99)),
                "windows_per_s": float(n / lat.sum()),
                "compile_s": float(self.compile_seconds),
            },
        }


def load_input(path, task):
    """Load samples for prediction from an index file (.txt of sample paths)
    or a directory of .npz/.pt sample files (sorted by name). Labels are
    optional — files without one get label -1.

    Returns ({loc: {mod: [N, ...]}}, labels [N] int32, names [N])."""
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "*.npz")) + glob.glob(os.path.join(path, "*.pt"))
        )
    else:
        files = [str(s) for s in np.loadtxt(path, dtype=str, ndmin=1)]
    if not files:
        raise ValueError(f"No sample files found at {path}")
    datas, labels = [], []
    for f in files:
        d, lab = _load_sample_file(f, task)
        datas.append(d)
        labels.append(-1 if lab is None else lab)
    stacked = {
        loc: {
            mod: np.stack([d[loc][mod] for d in datas]).astype(np.float32)
            for mod in datas[0][loc]
        }
        for loc in datas[0]
    }
    return stacked, np.asarray(labels, np.int32), [os.path.basename(f) for f in files]


def write_predictions(path, names, result, labels=None):
    """Write a predictions JSON: one record per sample + latency summary."""
    records = []
    for i, name in enumerate(names):
        rec = {
            "sample": name,
            "pred": int(result["preds"][i]),
            "probs": [round(float(p), 6) for p in result["probs"][i]],
        }
        if labels is not None and labels[i] >= 0:
            rec["label"] = int(labels[i])
        records.append(rec)
    payload = {"latency": result["latency"], "predictions": records}
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return payload
