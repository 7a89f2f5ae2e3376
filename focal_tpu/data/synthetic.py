"""Deterministic synthetic datasets shaped like a recipe.

Stands in for the (non-distributable) raw sensor data in tests, benchmarks and
CI, as suggested by the reference's sample schema (SURVEY.md §2.2): each class
gets a distinct set of per-modality carrier frequencies plus noise, so models
can genuinely learn the task.
"""

import os

import numpy as np

from focal_tpu.data.dataset import ArrayDataset, TASK_LABEL_KEYS


def synthetic_arrays(dataset_config, task, num_samples, seed=0, num_seqs=None):
    """Build {loc:{mod:[N,c,i,s]}}, labels[N], names[N] for a recipe."""
    rng = np.random.default_rng(seed)
    num_classes = dataset_config[task]["num_classes"]
    num_segments = dataset_config["num_segments"]
    locations = dataset_config["location_names"]
    seq_len = dataset_config.get("seq_len", 4)
    if num_seqs is None:
        num_seqs = max(1, num_samples // seq_len)
    num_samples = num_seqs * seq_len

    # temporal sequences share a class (samples of one recording)
    seq_labels = rng.integers(0, num_classes, size=num_seqs)
    labels = np.repeat(seq_labels, seq_len).astype(np.int32)
    names = [f"seq{s}_{t}.npz" for s in range(num_seqs) for t in range(seq_len)]

    data = {}
    for loc in locations:
        data[loc] = {}
        for mod in dataset_config["loc_modalities"][loc]:
            if mod not in dataset_config["loc_mod_spectrum_len"][loc]:
                continue
            c = dataset_config["loc_mod_in_time_channels"][loc][mod]
            s = dataset_config["loc_mod_spectrum_len"][loc][mod]
            t = np.arange(num_segments * s, dtype=np.float32) / float(s)
            # class-dependent carrier per (mod, channel)
            x = np.zeros((num_samples, c, num_segments * s), np.float32)
            for ch in range(c):
                freq = 1.0 + (labels[:, None] + 1) * (0.37 + 0.11 * ch) * (1.0 + 0.23 * len(mod))
                phase = rng.uniform(0, 2 * np.pi, size=(num_samples, 1)).astype(np.float32)
                x[:, ch, :] = np.sin(2 * np.pi * freq * t[None, :] + phase)
            x += rng.normal(0, 0.3, size=x.shape).astype(np.float32)
            data[loc][mod] = x.reshape(num_samples, c, num_segments, s)
    return data, labels, names


def make_synthetic_dataset(dataset_config, task, num_samples, seed=0, seq_len=None):
    data, labels, names = synthetic_arrays(dataset_config, task, num_samples, seed)
    return ArrayDataset(data, labels, names, seq_len)


def write_synthetic_sample_files(dataset_config, task, out_dir, num_samples, seed=0, splits=(0.7, 0.15, 0.15)):
    """Write .npz sample files + index files in the reference on-disk layout.

    Produces {train,val,test,pretrain}_index.txt; split boundaries fall on
    sequence boundaries so subsequences never straddle splits.
    """
    os.makedirs(out_dir, exist_ok=True)
    data, labels, names = synthetic_arrays(dataset_config, task, num_samples, seed)
    label_key = TASK_LABEL_KEYS.get(task)

    paths = []
    for i, name in enumerate(names):
        path = os.path.join(out_dir, name)
        arrays = {}
        if label_key:
            arrays[f"label.{label_key}"] = np.int32(labels[i])
        else:
            arrays["label"] = np.int32(labels[i])
        for loc in data:
            for mod in data[loc]:
                arrays[f"data.{loc}.{mod}"] = data[loc][mod][i]
        np.savez(path, **arrays)
        paths.append(path)

    seq_len = dataset_config.get("seq_len", 4)
    n_seq = len(paths) // seq_len
    n_train_seq = int(n_seq * splits[0])
    n_val_seq = int(n_seq * splits[1])
    cut1, cut2 = n_train_seq * seq_len, (n_train_seq + n_val_seq) * seq_len
    index = {
        "train": paths[:cut1],
        "val": paths[cut1:cut2],
        "test": paths[cut2:],
        "pretrain": paths[:cut2],
    }
    index_files = {}
    for split, files in index.items():
        idx_path = os.path.join(out_dir, f"{split}_index.txt")
        with open(idx_path, "w") as f:
            f.write("\n".join(files) + "\n")
        index_files[split] = idx_path
    return index_files
