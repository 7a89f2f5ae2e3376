"""Stage the downstream-quality parity A/B (VERDICT round-2 item 2).

Generates ONE fixed synthetic MOD-shaped dataset on disk in the reference's
.pt sample format (readable by BOTH frameworks — focal_tpu's ArrayDataset
has a .pt fallback), plus index files and a scaled-down recipe staged where
the reference CLI expects it (./data/MOD.yaml relative to its CWD).

Layout under --out:
    run/data/MOD.yaml     staged recipe (absolute index paths, reduced epochs)
    samples/seq{K}_{i}.pt reference-format samples
    {pretrain,train,val,test}_index.txt
    weights/              (created by the reference run: cwd=run -> ../weights)

Recipe deviations from stock MOD.yaml, all REQUIRED for a fair matched A/B
on this machine and applied to BOTH sides:
  - pretrain/finetune epochs reduced (torch-CPU reference would need days
    at 6000/200);
  - random pool drops time_warp/mag_warp (tsai is not installed for the
    reference; focal_tpu matches the remaining pool's semantics exactly);
  - extra label-noise on the synthetic carriers so accuracy does not
    saturate at 1.0 (an informative operating point).

Usage: python tools/make_parity_dataset.py --out /tmp/parity --samples 384
"""

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--samples", type=int, default=384)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--noise", type=float, default=1.0, help="extra noise std")
    ap.add_argument("--pretrain-epochs", type=int, default=300)
    ap.add_argument("--finetune-epochs", type=int, default=50)
    a = ap.parse_args()

    import torch

    from focal_tpu.data.synthetic import synthetic_arrays
    from focal_tpu.params.yaml_utils import load_dataset_config

    cfg = load_dataset_config("MOD")
    data, labels, names = synthetic_arrays(cfg, "vehicle_classification", a.samples, seed=a.seed)
    rng = np.random.default_rng(a.seed + 1)

    sample_dir = os.path.join(a.out, "samples")
    os.makedirs(sample_dir, exist_ok=True)
    seq_len = cfg["seq_len"]
    n = len(labels)

    paths = []
    for i in range(n):
        sample_data = {}
        for loc in data:
            sample_data[loc] = {}
            for mod in data[loc]:
                x = data[loc][mod][i] + rng.normal(0, a.noise, size=data[loc][mod][i].shape)
                sample_data[loc][mod] = torch.tensor(x, dtype=torch.float32)
        # MOD labels are dicts keyed by task (reference:
        # multi_modal_dataset.py:43-52); aux tasks get placeholder zeros
        label = {
            "vehicle_type": torch.tensor(int(labels[i])),
            "distance": torch.tensor(0),
            "speed": torch.tensor(0),
        }
        path = os.path.join(sample_dir, names[i].replace(".npz", ".pt"))
        torch.save({"data": sample_data, "label": label, "flag": {}}, path)
        paths.append(path)

    # split on sequence boundaries: 70/15/15
    n_seqs = n // seq_len
    seq_ids = np.arange(n_seqs)
    rng.shuffle(seq_ids)
    n_train = int(n_seqs * 0.7)
    n_val = int(n_seqs * 0.15)
    splits = {
        "train": seq_ids[:n_train],
        "val": seq_ids[n_train : n_train + n_val],
        "test": seq_ids[n_train + n_val :],
    }

    def write_index(name, seqs):
        files = [paths[s * seq_len + t] for s in sorted(seqs) for t in range(seq_len)]
        p = os.path.join(a.out, f"{name}_index.txt")
        with open(p, "w") as f:
            f.write("\n".join(files) + "\n")
        return p

    idx = {name: write_index(name, seqs) for name, seqs in splits.items()}
    # pretrain uses the train sequences (labels unused during pretraining)
    idx["pretrain"] = write_index("pretrain", splits["train"])

    cfg["pretrain_index_file"] = idx["pretrain"]
    for task in ("vehicle_classification", "distance_classification", "speed_classification"):
        cfg[task]["train_index_file"] = idx["train"]
        cfg[task]["val_index_file"] = idx["val"]
        cfg[task]["test_index_file"] = idx["test"]
    cfg["FOCAL"]["pretrain_lr_scheduler"]["train_epochs"] = a.pretrain_epochs
    cfg["FOCAL"]["finetune_lr_scheduler"]["train_epochs"] = a.finetune_epochs
    # warmup must fit inside the shortened schedules
    cfg["FOCAL"]["pretrain_lr_scheduler"]["warmup_epochs"] = min(
        cfg["FOCAL"]["pretrain_lr_scheduler"].get("warmup_epochs", 0), a.pretrain_epochs // 10
    )
    cfg["FOCAL"]["finetune_lr_scheduler"]["warmup_epochs"] = min(
        cfg["FOCAL"]["finetune_lr_scheduler"].get("warmup_epochs", 0), a.finetune_epochs // 10
    )
    # drop the tsai warps from the random pool (matched on both sides)
    pool = cfg["FOCAL"]["random_augmenters"]["time_augmenters"]
    cfg["FOCAL"]["random_augmenters"]["time_augmenters"] = [
        p for p in pool if p not in ("time_warp", "mag_warp")
    ]

    run_data = os.path.join(a.out, "run", "data")
    os.makedirs(run_data, exist_ok=True)
    recipe = os.path.join(run_data, "MOD.yaml")
    with open(recipe, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print(f"staged: {n} samples, recipe {recipe}")
    print(f"splits: train {len(splits['train'])*seq_len} val {len(splits['val'])*seq_len} "
          f"test {len(splits['test'])*seq_len}")


if __name__ == "__main__":
    main()
