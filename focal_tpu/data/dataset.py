"""In-memory multimodal dataset.

TPU-first redesign of the reference's lazy per-sample ``torch.load`` dataset
(reference: src/input_utils/multi_modal_dataset.py:9-131). Instead of paying
per-batch host work + H2D copies, the whole split is stacked into contiguous
arrays once; training batches are then pure on-device gathers inside jit.

Sample schema parity: each sample file holds
    {"label": int or {task: int}, "data": {loc: {mod: [c, i, s] float32}}}
as either a torch ``.pt`` (reference format) or an ``.npz`` with keys
``label.<task>`` / ``label`` and ``data.<loc>.<mod>``.
"""

import os
import re

import numpy as np

TASK_LABEL_KEYS = {
    "vehicle_classification": "vehicle_type",
    "distance_classification": "distance",
    "speed_classification": "speed",
}


def _label_for_task(label, task):
    """Pick the right label out of a possibly task-keyed dict
    (reference: multi_modal_dataset.py:42-53)."""
    if isinstance(label, dict):
        key = TASK_LABEL_KEYS.get(task)
        if key is None or key not in label:
            raise ValueError(f"Unknown task {task} for label dict with keys {list(label)}")
        label = label[key]
    return int(np.asarray(label))


def _load_sample_file(path, task):
    """Load one sample file (.npz or torch .pt) -> (data_dict, int label)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            data = {}
            label = None
            label_dict = {}
            for key in z.files:
                if key == "label":
                    label = int(z[key])
                elif key.startswith("label."):
                    label_dict[key.split(".", 1)[1]] = int(z[key])
                elif key.startswith("data."):
                    _, loc, mod = key.split(".")
                    data.setdefault(loc, {})[mod] = np.asarray(z[key], dtype=np.float32)
            if label_dict:
                label = _label_for_task(label_dict, task)
            return data, label
    # torch .pt fallback for reference-produced datasets
    import torch

    sample = torch.load(path, map_location="cpu", weights_only=False)
    data = {
        loc: {mod: np.asarray(t, dtype=np.float32) for mod, t in mods.items()}
        for loc, mods in sample["data"].items()
    }
    label = sample.get("label")  # serving inputs may be unlabeled
    return data, None if label is None else _label_for_task(label, task)


def _bulk_load_native(sample_files, task):
    """Parallel C++ bulk load of a homogeneous .npz split. Returns
    ({loc: {mod: [N,...]}}, labels) or None to fall back to Python."""
    if not all(f.endswith(".npz") for f in sample_files):
        return None
    try:
        from focal_tpu import native
    except Exception:
        return None
    if not native.available():
        return None

    # discover schema from the first sample
    with np.load(sample_files[0]) as z:
        data_keys = {k: z[k].shape for k in z.files if k.startswith("data.")}
        label_keys = [k for k in z.files if k == "label" or k.startswith("label.")]
    if not data_keys:
        return None
    label_key = "label"
    if label_key not in label_keys:
        wanted = TASK_LABEL_KEYS.get(task)
        label_key = f"label.{wanted}" if wanted and f"label.{wanted}" in label_keys else None
    if label_key is None:
        return None

    stacked = {}
    for key, shape in data_keys.items():
        arr = native.load_batch_f32(sample_files, key, shape)
        if arr is None:
            return None
        _, loc, mod = key.split(".")
        stacked.setdefault(loc, {})[mod] = arr
    labels = native.load_scalar_i64(sample_files, label_key)
    if labels is None:
        return None
    return stacked, labels.astype(np.int32)


class ArrayDataset:
    """A fully materialised split: stacked arrays + sequence structure."""

    def __init__(self, data, labels, sample_names=None, seq_len=None, seq_delimiter="_"):
        """
        Args:
          data: {loc: {mod: [N, c, i, s] float32 np.ndarray}}
          labels: [N] int32
          sample_names: list of N basenames, used to derive temporal sequences
          seq_len: subsequence length for contrastive sequence sampling
        """
        self.data = data
        self.labels = np.asarray(labels, dtype=np.int32)
        self.sample_names = sample_names
        self.seq_len = seq_len
        self.subseq_idx = None
        if seq_len is not None and sample_names is not None:
            self.subseq_idx = partition_subsequences(sample_names, seq_len, seq_delimiter)

    def __len__(self):
        return len(self.labels)

    @property
    def num_subseqs(self):
        return 0 if self.subseq_idx is None else len(self.subseq_idx)

    def subsample(self, label_ratio, seed=0):
        """Random label-ratio subsampling (reference: multi_modal_dataset.py:32-34)."""
        if label_ratio >= 1:
            return self
        rng = np.random.default_rng(seed)
        n = len(self)
        keep = rng.permutation(n)[: round(n * label_ratio)]
        data = {loc: {mod: a[keep] for mod, a in mods.items()} for loc, mods in self.data.items()}
        names = [self.sample_names[i] for i in keep] if self.sample_names else None
        return ArrayDataset(data, self.labels[keep], names, self.seq_len)

    @classmethod
    def from_index_file(cls, index_file, task, seq_len=None, seq_delimiter="_"):
        sample_files = [str(s) for s in np.loadtxt(index_file, dtype=str, ndmin=1)]
        if not sample_files:
            raise ValueError(f"Empty index file: {index_file}")
        names = [os.path.basename(f) for f in sample_files]

        result = _bulk_load_native(sample_files, task)
        if result is not None:
            stacked, labels = result
            return cls(stacked, labels, names, seq_len, seq_delimiter)

        datas, labels = [], []
        for f in sample_files:
            d, l = _load_sample_file(f, task)
            if l is None:
                raise ValueError(f"Sample without a label in training index: {f}")
            datas.append(d)
            labels.append(l)
        locs = list(datas[0].keys())
        stacked = {
            loc: {
                mod: np.stack([d[loc][mod] for d in datas]).astype(np.float32)
                for mod in datas[0][loc]
            }
            for loc in locs
        }
        return cls(stacked, np.asarray(labels, np.int32), names, seq_len, seq_delimiter)


def partition_subsequences(sample_names, seq_len, delimiter="_"):
    """Group samples into fixed-length temporal subsequences.

    Sequence id = basename up to the last delimiter; order = trailing integer;
    the final short window is padded by repeating its last sample
    (reference: multi_modal_dataset.py:67-108).

    Returns: int32 [n_subseq, seq_len] of sample indices.
    """
    seq_to_samples = {}
    for idx, name in enumerate(sample_names):
        base = os.path.basename(name)
        if delimiter in base:
            seq, tail = base.rsplit(delimiter, 1)
        else:
            seq, tail = base, "0"
        m = re.match(r"(\d+)", tail.split(".")[0])
        order = int(m.group(1)) if m else 0
        seq_to_samples.setdefault(seq, []).append((order, idx))

    subseqs = []
    for seq in seq_to_samples:
        ordered = [i for _, i in sorted(seq_to_samples[seq])]
        for i in range(0, len(ordered), seq_len):
            window = ordered[i : i + seq_len]
            while len(window) < seq_len:
                window.append(window[-1])
            subseqs.append(window)
    return np.asarray(subseqs, dtype=np.int32)
