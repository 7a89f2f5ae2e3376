"""Measure what tensor parallelism actually buys at MOD_WIDE scale
(VERDICT round-4 item 4): per-device live-buffer bytes for the FULL FOCAL
pretrain step under dp=8 vs dp=4 x tp=2 on the virtual 8-device CPU mesh.

Two measurements per configuration:
  1. per-device STATE bytes (params + optimizer moments + batch stats),
     computed from each leaf's actual NamedSharding shard shape — pure
     layout math, identical on CPU and TPU;
  2. XLA's compiled memory analysis of the jitted train step (argument /
     output / temp / code sizes per device program). The CPU backend's
     scheduling differs from TPU's, so temp bytes are indicative, not a
     TPU prediction — the state bytes are exact.

Usage:
  FOCAL_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/tp_memory_probe.py [--dataset MOD_WIDE] [--batch 256] \
      [--model SW_Transformer]

Writes artifacts/r5/tp_memory.json and prints a markdown table for
BASELINE.md.
"""

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def per_device_state_bytes(state):
    """Sum over leaves of the shard-local byte count on device 0."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(state):
        if not hasattr(leaf, "sharding") or not hasattr(leaf, "shape"):
            continue
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        total += math.prod(shard_shape) * leaf.dtype.itemsize if shard_shape else leaf.dtype.itemsize
    return total


def build(model_name, dataset, batch, dp, mp):
    from __graft_entry__ import _make_args
    from focal_tpu.data.synthetic import make_synthetic_dataset
    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.parallel import tp
    from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated
    from focal_tpu.train.losses import make_focal_loss
    from focal_tpu.train.optim import build_optimizer
    from focal_tpu.train.state import init_state
    from focal_tpu.train.steps import make_pretrain_step

    args = _make_args([
        "-dataset", dataset, "-model", model_name, "-learn_framework", "FOCAL",
        "-stage", "pretrain", "-synthetic", "-compute_dtype", "bfloat16",
        "-data_parallel", str(dp), "-model_parallel", str(mp),
    ])
    mesh_plan = make_mesh_plan(dp, mp)
    model = build_backbone(args)
    augmenter = build_augmenter(args)
    seq_len = args.dataset_config["seq_len"]
    ds = make_synthetic_dataset(args.dataset_config, args.task, max(batch, 512),
                                seed=0, seq_len=seq_len)
    data = put_replicated(
        {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in ds.data.items()},
        mesh_plan,
    )
    sample = jax.jit(augmenter.no)(
        {loc: {m: jnp.asarray(a[:2]) for m, a in mods.items()} for loc, mods in ds.data.items()}
    )
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    tx, _ = build_optimizer(args, state.params, steps_per_epoch=100)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    if mp > 1:
        sh = tp.state_shardings(state, mesh_plan)
        state = jax.device_put(state, sh)
    else:
        sh = None
        state = put_replicated(state, mesh_plan)
    focal_loss = make_focal_loss(args)
    step = make_pretrain_step(model, augmenter, focal_loss, mesh_plan, state_shardings=sh)
    idx = jax.device_put(jnp.arange(batch, dtype=jnp.int32) % len(ds),
                         mesh_plan.batch_sharded)
    return step, state, data, idx


def probe(model_name, dataset, batch, dp, mp):
    step, state, data, idx = build(model_name, dataset, batch, dp, mp)
    rng = jax.random.key(1)
    res = {"per_device_state_bytes": per_device_state_bytes(state)}
    compiled = step.lower(state, data, idx, rng).compile()
    try:
        ma = compiled.memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                res[k] = int(v)
    except Exception as e:  # memory analysis is backend-dependent
        res["memory_analysis_error"] = str(e)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="MOD_WIDE")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="SW_Transformer")
    a = ap.parse_args()

    assert len(jax.devices()) >= 8, "run with xla_force_host_platform_device_count=8"
    out = {}
    for name, dp, mp in (("dp8", 8, 1), ("dp4xtp2", 4, 2)):
        print(f"[probe] {a.model} {a.dataset} batch={a.batch} {name} ...", file=sys.stderr, flush=True)
        out[name] = probe(a.model, a.dataset, a.batch, dp, mp)
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(REPO, "artifacts", "r5", "tp_memory.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    meta = {"model": a.model, "dataset": a.dataset, "batch": a.batch, **out}
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")

    gib = 1024 ** 3
    print("\n| layout | state bytes/device | step temp bytes/device | step args/device |")
    print("|---|---|---|---|")
    for name, r in out.items():
        print(f"| {name} | {r['per_device_state_bytes'] / gib:.3f} GiB "
              f"| {r.get('temp_size_in_bytes', 0) / gib:.3f} GiB "
              f"| {r.get('argument_size_in_bytes', 0) / gib:.3f} GiB |")


if __name__ == "__main__":
    main()
