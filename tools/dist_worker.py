"""Minimal multi-process DP worker for the parity test.

Runs a few FOCAL pretrain epochs on synthetic MOD_TINY data with the
row-sharded layout over the global device mesh — no eval, no KNN, no
checkpoints — and prints one JSON line with the per-epoch losses and a
parameter checksum. The test launches this once single-process (8 local
devices) and once as 2 processes x 4 devices; same global mesh + same seeds
must give identical results up to collective reduction order.

Usage:
    python tools/dist_worker.py [--coordinator host:port --nproc N --pid I]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nproc", type=int, default=0)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument(
        "--stream", action="store_true",
        help="Force the streaming data path (-hbm_budget_gb tiny): each "
        "process assembles + ships only its local batch columns per block "
        "(VERDICT round-3 item 6).",
    )
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.coordinator:
        jax.distributed.initialize(
            coordinator_address=a.coordinator, num_processes=a.nproc, process_id=a.pid
        )

    import jax.numpy as jnp
    import numpy as np
    import optax

    from focal_tpu.data.loader import create_dataloader
    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.params.cli import build_parser
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.parallel import distributed as dist
    from focal_tpu.parallel.mesh import make_mesh_plan
    from focal_tpu.train.losses import make_focal_loss
    from focal_tpu.train.optim import build_optimizer
    from focal_tpu.train.state import init_state
    from focal_tpu.train.steps import make_pretrain_epoch_fn
    from focal_tpu.train import loops

    argv = [
        "-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL",
        "-stage", "pretrain", "-synthetic", "-synthetic_samples", "64",
        "-batch_size", "32", "-seed", "3", "-data_layout", "sharded",
        "-output_dir", os.environ.get("TMPDIR", "/tmp"),
    ]
    if a.stream:
        argv += ["-hbm_budget_gb", "0.000001", "-stream_block_steps", "2"]
    args = build_parser().parse_args(argv)
    args.option = "train"
    args = set_auto_params(args)

    run = loops.Run(args)
    sample = run.sample_freq_batch()
    state = init_state(args, run.model, sample, optax.identity(), jax.random.key(args.seed))
    tx, _ = build_optimizer(args, state.params, steps_per_epoch=len(run.train_loader))
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    state = dist.put_replicated_global(state, run.mesh_plan)

    focal_loss = make_focal_loss(args)
    train_ds = run.train_loader.dataset
    if a.stream:
        from focal_tpu.data import streaming as strm

        assert run.streaming, "tiny -hbm_budget_gb must force streaming"
        epoch_fn = strm.make_streaming_pretrain_fn(
            run.model, run.augmenter, focal_loss,
            host_data=run.host_train_data,
            n_units=train_ds.num_subseqs if train_ds.subseq_idx is not None else len(train_ds),
            batch_size=run.train_loader.batch_size,
            subseq_idx=train_ds.subseq_idx,
            mesh_plan=run.mesh_plan,
            fused_views=True,
            seed=args.seed,
            block_steps=getattr(args, "stream_block_steps", 0) or 64,
        )
    else:
        assert run.data_layout == "sharded", run.data_layout
        epoch_fn = make_pretrain_epoch_fn(
            run.model, run.augmenter, focal_loss,
            n_items=run.train_group["n_items"],
            batch_size=run.train_loader.batch_size,
            subseq_idx=train_ds.subseq_idx,
            mesh_plan=run.mesh_plan,
            data_layout="sharded",
        )

    rng = jax.random.key(args.seed + 1)
    losses = []
    for _ in range(a.epochs):
        state, loss = epoch_fn(state, run.device_data["train"], rng)
        losses.append(float(jax.device_get(loss)))

    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))
    print(json.dumps({
        "process": dist.process_index(),
        "losses": [round(l, 6) for l in losses],
        "param_checksum": round(checksum, 4),
        "n_devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
