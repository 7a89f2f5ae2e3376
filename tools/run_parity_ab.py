"""Run the downstream-quality parity A/B (VERDICT round-2 item 2).

Same fixed on-disk dataset (stage with tools/make_parity_dataset.py), same
scaled-down recipe, three full pretrain->finetune pipelines:

  1. reference torch code on CPU (its own train.py, timm/tsai shims on
     PYTHONPATH — tools/ref_shims/);
  2. focal_tpu, default fused-views pretrain;
  3. focal_tpu, -no_fused_views (reference BatchNorm statistics).

Prints a JSON result line and a markdown row block for PARITY.md. The
final metric is test accuracy/F1 at the best-val-accuracy finetune epoch,
as logged by each framework's own evaluation.

Usage:
  python tools/make_parity_dataset.py --out /tmp/parity --samples 384
  python tools/run_parity_ab.py --dir /tmp/parity [--skip-reference]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd, env, log_path, timeout=14400):
    t0 = time.time()
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, cwd=cwd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           timeout=timeout)
    dt = time.time() - t0
    if p.returncode != 0:
        tail = open(log_path).read()[-3000:]
        raise RuntimeError(f"{' '.join(cmd)} failed ({p.returncode}):\n{tail}")
    return dt


def parse_metrics(log_path):
    """Best (val acc, test acc@that epoch, test f1@that epoch) from either
    framework's log — both print 'Val acc: X ... Test acc: Y, test f1: Z'
    blocks per validation point (same cadence/fields by design)."""
    text = open(log_path).read()
    vals = [float(m) for m in re.findall(r"[Vv]al acc:\s*([0-9.]+)", text)]
    tests = re.findall(r"[Tt]est acc:\s*([0-9.]+),\s*test f1:\s*([0-9.]+)", text)
    if not vals or not tests or len(vals) != len(tests):
        raise ValueError(f"could not parse metrics from {log_path} "
                         f"({len(vals)} val, {len(tests)} test entries)")
    best = max(range(len(vals)), key=lambda i: vals[i])
    return {
        "best_val_acc": vals[best],
        "test_acc": float(tests[best][0]),
        "test_f1": float(tests[best][1]),
        "val_points": len(vals),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="output of make_parity_dataset.py")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--skip-unfused", action="store_true")
    ap.add_argument("--platform", default=None, help="FOCAL_PLATFORM for the focal_tpu runs")
    a = ap.parse_args()

    d = os.path.abspath(a.dir)
    run_cwd = os.path.join(d, "run")
    recipe = os.path.join(run_cwd, "data", "MOD.yaml")
    results = {}

    if not a.skip_reference:
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{REPO}/tools/ref_shims:/root/reference/src"
        ref = os.path.join("/root/reference/src", "train.py")
        base = [sys.executable, ref, "-model=DeepSense", "-learn_framework=FOCAL", "-gpu=cpu"]
        t_pre = run(base + ["-stage=pretrain"], run_cwd, env, os.path.join(d, "ref_pretrain.log"))
        t_ft = run(base + ["-stage=finetune"], run_cwd, env, os.path.join(d, "ref_finetune.log"))
        results["reference_torch_cpu"] = {
            **parse_metrics(os.path.join(d, "ref_finetune.log")),
            "pretrain_s": round(t_pre, 1), "finetune_s": round(t_ft, 1),
        }
        print(json.dumps({"reference_torch_cpu": results["reference_torch_cpu"]}), flush=True)

    def focal(tag, extra):
        env = dict(os.environ)
        # PREPEND: this machine registers its TPU backend via a PYTHONPATH
        # site dir — replacing the var would drop it
        env["PYTHONPATH"] = REPO + (":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
        if a.platform:
            env["FOCAL_PLATFORM"] = a.platform
        out = os.path.join(d, f"focal_{tag}")
        base = [sys.executable, os.path.join(REPO, "train.py"), "-model=DeepSense",
                "-learn_framework=FOCAL", "-dataset_config", recipe,
                "-output_dir", out, *extra]
        t_pre = run(base + ["-stage=pretrain"], d, env, os.path.join(d, f"focal_{tag}_pretrain.log"))
        t_ft = run(base + ["-stage=finetune"], d, env, os.path.join(d, f"focal_{tag}_finetune.log"))
        results[f"focal_tpu_{tag}"] = {
            **parse_metrics(os.path.join(d, f"focal_{tag}_finetune.log")),
            "pretrain_s": round(t_pre, 1), "finetune_s": round(t_ft, 1),
        }
        print(json.dumps({f"focal_tpu_{tag}": results[f"focal_tpu_{tag}"]}), flush=True)

    if not a.skip_fused:
        focal("fused", [])
    if not a.skip_unfused:
        focal("no_fused_views", ["-no_fused_views"])

    with open(os.path.join(d, "parity_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("\n| Run | best val acc | test acc | test F1 |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['best_val_acc']:.4f} | {r['test_acc']:.4f} | {r['test_f1']:.4f} |")


if __name__ == "__main__":
    main()
