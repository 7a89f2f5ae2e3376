"""Label-starved confirmation of the attribution result (VERDICT round-4
item 8): re-run FINETUNE ONLY at -label_ratio 0.1 (27 labeled samples on the
staged noise-3.0 dataset) from attribution arms' existing pretrained
checkpoints — the paper's headline regime (reference README.md:9 claims the
largest wins at low label ratios; round 3 measured 0.85 vs 0.47 there).

Usage (after tools/r5_attribution_queue.sh has produced the arms):
  python tools/run_label_starved.py --dir /tmp/attr_n3 --platform tpu \
      --keys control_s1_tpu control_s2_tpu torch_init_s1_tpu both_s1_tpu

Results append to artifacts/label_starved_ab.json.
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from run_attribution_ab import parse_backend, parse_metrics, run  # noqa: E402

# finetune-relevant flags per arm prefix (init/pretrain-only arms add none)
FT_FLAGS = {"ref_lr": ["-ref_lr_timing"], "both": ["-ref_lr_timing"],
            "ref_like": ["-ref_lr_timing"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--keys", nargs="+", required=True,
                    help="attribution result keys, e.g. control_s1_tpu")
    ap.add_argument("--platform", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--label_ratio", type=float, default=0.1)
    a = ap.parse_args()

    d = os.path.abspath(a.dir)
    recipe = os.path.join(d, "run", "data", "MOD.yaml")
    results_path = os.path.join(REPO, "artifacts", "label_starved_ab.json")
    results = {}
    if os.path.exists(results_path):
        results = json.load(open(results_path))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    if a.platform == "cpu":
        env["FOCAL_PLATFORM"] = "cpu"
    else:
        env.pop("FOCAL_PLATFORM", None)
        env.pop("JAX_PLATFORMS", None)

    for key in a.keys:
        out_key = f"{key}_lr{a.label_ratio}"
        if out_key in results:
            print(f"skip {out_key} (already done)", flush=True)
            continue
        m = re.match(r"(.+)_s(\d+)(?:_(cpu|tpu))?$", key)
        if not m:
            raise ValueError(f"unparseable key {key}")
        arm, seed = m.group(1), int(m.group(2))
        out_dir = os.path.join(d, f"focal_{key}")
        if not os.path.isdir(out_dir):
            print(f"skip {out_key}: no pretrained run at {out_dir}", flush=True)
            continue
        cmd = [
            sys.executable, os.path.join(REPO, "train.py"), "-model=DeepSense",
            "-learn_framework=FOCAL", "-dataset_config", recipe,
            "-compute_dtype", "float32", "-output_dir", out_dir,
            "-seed", str(seed), "-stage=finetune",
            "-label_ratio", str(a.label_ratio), *FT_FLAGS.get(arm, []),
        ]
        log = os.path.join(d, f"focal_{out_key}_finetune.log")
        t = run(cmd, d, env, log)
        results[out_key] = {
            **parse_metrics(log), "finetune_s": round(t, 1),
            "backend": parse_backend(log),
        }
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
            f.write("\n")
        print(json.dumps({out_key: results[out_key]}), flush=True)

    print("\n| Arm (finetune @ label_ratio) | best val acc | test acc | test F1 |")
    print("|---|---|---|---|")
    for name, r in sorted(results.items()):
        print(f"| {name} | {r['best_val_acc']:.4f} | {r['test_acc']:.4f} | {r['test_f1']:.4f} |")


if __name__ == "__main__":
    main()
