"""Batch planning over device-resident datasets.

Where the reference streams per-sample ``.pt`` files through 10 DataLoader
worker processes and copies every batch host->device
(reference: src/input_utils/multi_modal_dataloader.py:12-78,
src/data_augmenter/Augmenter.py:128-138), this loader materialises the split
once and only yields **index arrays**; the jitted train step gathers batches
directly in HBM. Static batch shapes: train drops the ragged final batch,
eval pads it and carries a weight mask.
"""

import numpy as np

from focal_tpu.data.dataset import ArrayDataset
from focal_tpu.data.synthetic import make_synthetic_dataset


class BatchPlan:
    """One batch: sample indices + per-sample validity weights."""

    __slots__ = ("idx", "weight")

    def __init__(self, idx, weight):
        self.idx = idx
        self.weight = weight


class DeviceDataLoader:
    """Yields BatchPlans over an ArrayDataset with static shapes."""

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False, sequence=False, seed=0):
        self.dataset = dataset
        self.sequence = sequence
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        if sequence:
            if dataset.subseq_idx is None:
                raise ValueError("sequence batching requires a dataset with subsequences")
            self.seq_len = dataset.subseq_idx.shape[1]
            # whole subsequences per batch (reference: multi_modal_dataloader.py:51-78)
            self.subseq_batch_size = max(1, min(batch_size // self.seq_len, dataset.num_subseqs))
            self.batch_size = self.subseq_batch_size * self.seq_len
            n = dataset.num_subseqs
            per = self.subseq_batch_size
        else:
            self.batch_size = min(batch_size, len(dataset))
            n = len(dataset)
            per = self.batch_size
        if drop_last:
            self.num_batches = max(1, n // per) if n >= per else 0
        else:
            self.num_batches = int(np.ceil(n / per))
        self._n = n
        self._per = per

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        order = np.arange(self._n)
        if self.shuffle:
            self._rng.shuffle(order)
        for b in range(self.num_batches):
            chunk = order[b * self._per : (b + 1) * self._per]
            valid = len(chunk)
            if valid < self._per:  # pad the ragged tail (eval only)
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], self._per - valid)])
            if self.sequence:
                idx = self.dataset.subseq_idx[chunk].reshape(-1)
                weight = np.repeat((np.arange(self._per) < valid), self.seq_len)
            else:
                idx = chunk
                weight = np.arange(self._per) < valid
            yield BatchPlan(idx.astype(np.int32), weight.astype(np.float32))


def _index_file_for(option, args):
    """Pick the split index file (reference: multi_modal_dataloader.py:14-26)."""
    if option == "train":
        if args.train_mode not in {"supervised"} and args.stage == "pretrain":
            return args.dataset_config["pretrain_index_file"]
        return args.dataset_config[args.task]["train_index_file"]
    if option == "val":
        return args.dataset_config[args.task]["val_index_file"]
    return args.dataset_config[args.task]["test_index_file"]


def _sequence_flag(option, args):
    return (
        getattr(args, "sequence_sampler", False)
        and args.train_mode == "contrastive"
        and args.stage == "pretrain"
    )


def create_dataloader(option, args, batch_size=None, workers=None):
    """Build a DeviceDataLoader for a split. `workers` accepted for CLI parity."""
    batch_size = batch_size or args.batch_size
    seq_len = args.dataset_config.get("seq_len") if args.sequence_sampler else None
    # RealWorld_HAR file names use '-' as the sequence delimiter
    # (reference: multi_modal_dataset.py:74-78); synthetic samples always use '_'
    delimiter = "-" if args.dataset == "RealWorld_HAR" and not getattr(args, "synthetic", False) else "_"

    if getattr(args, "synthetic", False):
        sizes = {"train": args.synthetic_samples, "val": args.synthetic_samples // 4, "test": args.synthetic_samples // 4}
        seeds = {"train": args.seed, "val": args.seed + 1, "test": args.seed + 2}
        dataset = make_synthetic_dataset(
            args.dataset_config, args.task, sizes[option], seed=seeds[option], seq_len=seq_len
        )
    else:
        dataset = ArrayDataset.from_index_file(
            _index_file_for(option, args), args.task, seq_len=seq_len, seq_delimiter=delimiter
        )

    if option == "train" and args.label_ratio < 1 and not (
        args.train_mode != "supervised" and args.stage == "pretrain"
    ):
        dataset = dataset.subsample(args.label_ratio, seed=args.seed)

    is_train = option == "train"
    return DeviceDataLoader(
        dataset,
        batch_size,
        shuffle=is_train,
        drop_last=is_train,
        sequence=_sequence_flag(option, args) ,
        seed=args.seed + {"train": 10, "val": 11, "test": 12}[option],
    )
