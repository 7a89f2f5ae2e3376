"""Trace N training steps and print a per-hlo_category time decomposition.

This is the tool behind BASELINE.md's step-decomposition tables (the SW
whole-block-kernel win and the DeepSense flat-profile analysis both came
from its output). It builds the same jitted FOCAL pretrain step bench.py
times, captures a jax.profiler trace of N steps, then parses the
trace.json.gz device lane: total device time per `hlo_category` plus the
top individual ops with their HLO long names.

Usage:
    python tools/profile_step.py DeepSense [--steps 20] [--keep DIR]

Reference contrast: the reference profiles with epoch wall-clock prints
(src/train_utils/pretrain.py:100); XLA's op-level categories are the
TPU-native equivalent and are what actually localizes a bottleneck
(`data formatting` found 27% of the SW step that op-level ablations
missed).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(model_name):
    from focal_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _make_args
    from focal_tpu.data.synthetic import make_synthetic_dataset
    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated
    from focal_tpu.train.losses import make_focal_loss
    from focal_tpu.train.optim import build_optimizer
    from focal_tpu.train.state import init_state
    from focal_tpu.train.steps import make_pretrain_step

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    mesh_plan = make_mesh_plan(0)
    args = _make_args([
        "-dataset", os.environ.get("BENCH_DATASET", "MOD"), "-model", model_name,
        "-learn_framework", "FOCAL", "-stage", "pretrain", "-synthetic",
        "-compute_dtype", os.environ.get("BENCH_DTYPE", "bfloat16"),
    ])
    model = build_backbone(args)
    augmenter = build_augmenter(args)
    ds = make_synthetic_dataset(
        args.dataset_config, args.task, max(batch, 512), seed=0,
        seq_len=args.dataset_config["seq_len"])
    data = put_replicated(
        {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in ds.data.items()},
        mesh_plan)
    sample = jax.jit(augmenter.no)(
        {loc: {m: jnp.asarray(a[:2]) for m, a in mods.items()} for loc, mods in ds.data.items()})
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    tx, _ = build_optimizer(args, state.params, steps_per_epoch=100)
    state = state.replace(tx=tx, opt_state=jax.jit(tx.init)(state.params))
    state = put_replicated(state, mesh_plan)
    step = make_pretrain_step(model, augmenter, make_focal_loss(args), mesh_plan)
    idx = jnp.arange(batch, dtype=jnp.int32) % len(ds)
    if mesh_plan is not None:
        idx = jax.device_put(idx, mesh_plan.batch_sharded)
    return step, state, data, idx, jax.random.key(1)


def trace_steps(step, state, data, idx, rng, n_steps, trace_dir):
    import jax

    for _ in range(3):
        state, metrics = step(state, data, idx, rng)
    float(jax.device_get(metrics["loss"]))  # value-fetch sync (axon quirk)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, metrics = step(state, data, idx, rng)
        float(jax.device_get(metrics["loss"]))
    return (time.perf_counter() - t0) / n_steps * 1e3


def analyze(trace_dir, n_steps, top_n=15):
    files = glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(files)[-1]) as fh:
        events = json.load(fh)["traceEvents"]
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    # HLO-op events carry hlo_category; the module-level jit_<fn> event and
    # step-number lanes do not (counting them would double-book the time)
    ops = [
        e for e in events
        if e.get("pid") in dev_pids and e.get("ph") == "X"
        and "hlo_category" in e.get("args", {})
    ]
    total = sum(e["dur"] for e in ops)
    by_cat = collections.Counter()
    by_op = collections.defaultdict(lambda: [0.0, "", ""])
    for e in ops:
        cat = e["args"]["hlo_category"]
        by_cat[cat] += e["dur"]
        rec = by_op[e["name"]]
        rec[0] += e["dur"]
        rec[1] = cat
        rec[2] = e["args"].get("long_name", "")[:140]
    print(f"\ndevice HLO time: {total / n_steps / 1e3:.3f} ms/step over {n_steps} steps")
    print(f"\n{'hlo_category':32s} {'ms/step':>8s}  share")
    for cat, dur in by_cat.most_common():
        print(f"{cat:32s} {dur / n_steps / 1e3:8.3f}  {100 * dur / total:5.1f}%")
    print(f"\ntop {top_n} ops:")
    for name, (dur, cat, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"  {dur / n_steps / 1e3:7.3f} ms  {cat:22s} {name}")
        if long_name:
            print(f"            {long_name}")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("model", choices=["DeepSense", "SW_Transformer"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--keep", default=None,
                    help="keep the raw trace in this directory (default: temp)")
    a = ap.parse_args()
    trace_dir = a.keep or tempfile.mkdtemp(prefix="focal_profile_")
    step, state, data, idx, rng = build_step(a.model)
    wall = trace_steps(step, state, data, idx, rng, a.steps, trace_dir)
    print(f"wall: {wall:.3f} ms/step")
    analyze(trace_dir, a.steps)
    if a.keep:
        print(f"\nraw trace kept in {trace_dir}")


if __name__ == "__main__":
    main()
