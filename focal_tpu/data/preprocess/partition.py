"""Split partitioning: write {train,val,test,pretrain}_index.txt files
(reference: src/data_preprocess/MOD/partition_data.py:44-117,
partition_data_pretrain.py:24-68).

Reference semantics preserved: random train/remainder split with
val == test (the reference evaluates on the same held-out pool for both), and
the pretrain index is the union of unlabeled extra samples and the supervised
train split.
"""

import argparse
import os
import random


def partition_samples(sample_dir, output_dir=None, train_ratio=0.8, val_equals_test=True, seed=0, extra_dir=None):
    output_dir = output_dir or sample_dir
    os.makedirs(output_dir, exist_ok=True)
    samples = sorted(
        os.path.join(sample_dir, f) for f in os.listdir(sample_dir) if f.endswith((".npz", ".pt"))
    )
    rng = random.Random(seed)
    rng.shuffle(samples)

    cut = int(len(samples) * train_ratio)
    train, rest = samples[:cut], samples[cut:]
    if val_equals_test:
        val, test = rest, rest
    else:
        half = len(rest) // 2
        val, test = rest[:half], rest[half:]

    extra = []
    if extra_dir and os.path.isdir(extra_dir):
        extra = sorted(
            os.path.join(extra_dir, f) for f in os.listdir(extra_dir) if f.endswith((".npz", ".pt"))
        )
    pretrain = extra + train

    index_files = {}
    for name, files in (("train", train), ("val", val), ("test", test), ("pretrain", pretrain)):
        path = os.path.join(output_dir, f"{name}_index.txt")
        with open(path, "w") as f:
            f.write("\n".join(files) + ("\n" if files else ""))
        index_files[name] = path
    return index_files


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--samples", required=True, help="Directory of extracted samples")
    parser.add_argument("--output", default=None, help="Where to write index files")
    parser.add_argument("--extra", default=None, help="Unlabeled extra samples for pretraining")
    parser.add_argument("--train-ratio", type=float, default=0.8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    idx = partition_samples(
        args.samples, args.output, args.train_ratio, seed=args.seed, extra_dir=args.extra
    )
    for k, v in idx.items():
        print(k, "->", v)


if __name__ == "__main__":
    main()
