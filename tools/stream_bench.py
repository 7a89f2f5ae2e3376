"""Streaming vs device-resident throughput at MOD shapes (VERDICT round-2
item 3 'done' criterion: streaming >= 80% of device-resident).

Runs the same DeepSense FOCAL pretrain workload twice through the REAL
train.py loop — once device-resident, once with the split forced over a
tiny HBM budget — and reports sustained windows/s for each plus the ratio.

Usage (on the TPU host):
    python tools/stream_bench.py [--samples 8192] [--epochs 30]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_mode(tag, extra, samples, epochs, env):
    out = tempfile.mkdtemp(prefix=f"strm_{tag}_")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "-model=DeepSense", "-dataset=MOD", "-learn_framework=FOCAL",
        "-stage=pretrain", "-synthetic", "-synthetic_samples", str(samples),
        "-epochs", str(epochs), "-val_epochs", str(epochs),
        "-output_dir", out, *extra,
    ]
    t0 = time.time()
    p = subprocess.run(cmd, cwd=out, env=env, capture_output=True, text=True, timeout=5400)
    dt = time.time() - t0
    if p.returncode != 0:
        raise RuntimeError(f"{tag} failed:\n{(p.stdout + p.stderr)[-3000:]}")
    log = p.stdout + p.stderr
    # the LAST per-epoch-block throughput line reflects the steady state
    # (first block pays compile)
    rates = [float(m) for m in re.findall(r"\(([0-9.]+) windows/s\)", log)]
    if not rates:
        raise RuntimeError(f"no throughput lines in {tag} output:\n{log[-2000:]}")
    return {"windows_per_s": rates[-1], "all_rates": rates, "wall_s": round(dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--block-steps", type=int, default=16)
    a = ap.parse_args()

    env = dict(os.environ)
    # prepend, don't replace: this machine's TPU backend registers via an
    # entry already on PYTHONPATH
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    resident = run_mode("resident", [], a.samples, a.epochs, env)
    streaming = run_mode(
        "streaming",
        ["-hbm_budget_gb", "0.000001", "-stream_block_steps", str(a.block_steps)],
        a.samples, a.epochs, env,
    )
    ratio = streaming["windows_per_s"] / resident["windows_per_s"]

    # Raw host->device link bandwidth, to separate "streaming pipeline is
    # slow" from "the link itself is the ceiling" (on a machine where the
    # chip sits behind a network tunnel, the latter dominates: streaming is
    # transfer-bound at whatever the link gives). Window bytes at MOD
    # shapes: audio [1,10,1600] f32 + seismic [1,10,20] f32.
    import numpy as np
    import jax
    import jax.numpy as jnp

    buf = np.zeros((32, 1024, 1024), np.float32)  # 128 MB
    jax.device_put(buf[:1]).block_until_ready()  # warm the path
    t0 = time.time()
    d = jax.device_put(buf)
    float(jnp.sum(d[0, 0, :2]))  # value-fetch sync
    link_mb_s = buf.nbytes / (time.time() - t0) / 1e6
    window_bytes = (10 * 1600 + 10 * 20) * 4
    link_ceiling_w_s = link_mb_s * 1e6 / window_bytes
    print(json.dumps({
        "device_resident_windows_per_s": resident["windows_per_s"],
        "streaming_windows_per_s": streaming["windows_per_s"],
        "ratio": round(ratio, 3),
        "h2d_link_mb_per_s": round(link_mb_s, 1),
        "link_ceiling_windows_per_s": round(link_ceiling_w_s, 1),
        "streaming_vs_link_ceiling": round(
            streaming["windows_per_s"] / link_ceiling_w_s, 3),
        "resident_rates": resident["all_rates"],
        "streaming_rates": streaming["all_rates"],
    }))


if __name__ == "__main__":
    main()
