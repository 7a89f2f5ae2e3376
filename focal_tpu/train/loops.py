"""Stage loops: supervised training, FOCAL pretraining, finetuning
(reference: src/train_utils/supervised_train.py:18-108, pretrain.py:21-107,
finetune.py:18-96).

Loop structure parity: epoch-granular schedules, validation every 5 epochs
(10 for pretrain) running val AND test, best-supervised/finetune by val
accuracy, best-pretrain by val loss, pretrain checkpoints are backbone-only.
"""

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from focal_tpu.data.loader import create_dataloader
from focal_tpu.models import build_backbone
from focal_tpu.ops import build_augmenter
from focal_tpu.params.output_paths import checkpoint_paths
from focal_tpu.train import checkpoint as ckpt
from focal_tpu.train import evaluate as ev
from focal_tpu.train.losses import make_focal_loss
from focal_tpu.train.optim import build_optimizer
from focal_tpu.train.state import init_state, param_count
from focal_tpu.train.steps import (
    make_classifier_epoch_fn,
    make_pretrain_epoch_fn,
)
from focal_tpu.parallel import distributed as dist
from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated


class Run:
    """Everything a stage loop needs, built once.

    Data layouts: "replicated" (default single-process; every device holds
    the whole split) or "sharded" (default multi-process; the TRAIN split is
    row-sharded over the data mesh axis in a device-grouped order, each
    process feeding only its local devices via
    jax.make_array_from_process_local_data — SURVEY §2.6's multi-host plan).
    Val/test splits are small and always replicated.
    """

    def __init__(self, args):
        self.args = args
        mp = getattr(args, "model_parallel", 1) or 1
        self.mesh_plan = make_mesh_plan(getattr(args, "data_parallel", 0), mp)
        layout = getattr(args, "data_layout", None) or "auto"
        if layout == "auto":
            layout = "sharded" if dist.process_count() > 1 else "replicated"
        if self.mesh_plan is None or self.mesh_plan.mp > 1:
            layout = "replicated"  # TP keeps data replicated over the model axis
        self.data_layout = layout
        if self.mesh_plan is not None and self.mesh_plan.mp > 1:
            logging.info(
                f"= Mesh: {self.mesh_plan.dp} (data) x {self.mesh_plan.mp} (model) devices"
            )
        self.train_loader = create_dataloader("train", args)
        self.val_loader = create_dataloader("val", args)
        self.test_loader = create_dataloader("test", args)
        logging.info(
            f"= Dataloaders: train {len(self.train_loader.dataset)} samples / "
            f"{len(self.train_loader)} steps, val {len(self.val_loader.dataset)}, "
            f"test {len(self.test_loader.dataset)} (layout: {self.data_layout}, "
            f"process {dist.process_index()}/{dist.process_count()})"
        )

        self.augmenter = build_augmenter(args)
        self.model = build_backbone(args)

        # HBM budget: splits whose per-device footprint exceeds it stream
        # from host RAM in double-buffered blocks instead of living in HBM
        # (data/streaming.py; the reference's lazy disk loading has no HBM
        # ceiling either — multi_modal_dataset.py:40)
        from focal_tpu.data import streaming as strm

        self.streaming = False
        train_bytes = strm.split_nbytes(self.train_loader.dataset.data)
        n_dev = self.mesh_plan.dp if self.mesh_plan else 1
        per_device = train_bytes // n_dev if self.data_layout == "sharded" else train_bytes
        budget = strm.device_budget_bytes(args)
        if per_device > budget:
            # streaming composes with TP: blocks shard P(None, 'data') over
            # the 2-D mesh (replicated over ``model``) while the state keeps
            # its TP layout (the block jits carry state_shardings)
            self.streaming = True
            self.data_layout = "replicated"  # streaming feeds whole batches
            multi = (
                f" ({dist.process_count()} processes, each feeding its local "
                "batch columns)" if dist.process_count() > 1 else ""
            )
            tp_note = (
                f" (state stays {self.mesh_plan.mp}-way model-sharded)"
                if self.mesh_plan is not None and self.mesh_plan.mp > 1 else ""
            )
            logging.info(
                f"= Train split {train_bytes / 1e9:.2f} GB exceeds the "
                f"{budget / 1e9:.2f} GB/device HBM budget: streaming host->device "
                f"in double-buffered blocks{multi}{tp_note}"
            )

        # device-resident split data
        self.device_data = {}
        self.device_labels = {}
        self.train_group = None
        for name, loader in (
            ("train", self.train_loader),
            ("val", self.val_loader),
            ("test", self.test_loader),
        ):
            ds = loader.dataset
            if name == "train":
                if self.streaming:
                    self.host_train_data = {
                        loc: {m: np.asarray(a) for m, a in mods.items()}
                        for loc, mods in ds.data.items()
                    }
                    self.device_data[name] = None
                    self.device_labels[name] = None
                    continue
                if self.data_layout == "sharded":
                    self._place_sharded_train(ds)
                    continue
            self.device_data[name] = dist.put_replicated_global(
                {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in ds.data.items()},
                self.mesh_plan,
            )
            self.device_labels[name] = dist.put_replicated_global(jnp.asarray(ds.labels), self.mesh_plan)
        self._eval_plans = {}

    def _place_sharded_train(self, ds):
        """Row-shard the train split: trim to a device-divisible unit count,
        scatter units over devices with a fixed seed-derived assignment (the
        static shard assignment would otherwise inherit any class ordering in
        the files), and store each device's rows contiguously — subsequences
        stay whole inside one device, so sequence gathers are local."""
        n_dev = self.mesh_plan.dp
        rng = np.random.default_rng(self.args.seed + 17)
        sequence = self.train_loader.sequence
        if sequence and ds.subseq_idx is not None:
            seq_len = ds.subseq_idx.shape[1]
            ns = (ds.num_subseqs // n_dev) * n_dev
            if ns == 0:
                raise ValueError(
                    f"train split has {ds.num_subseqs} subsequences for {n_dev} devices; "
                    "too few for the sharded layout"
                )
            order = rng.permutation(ds.num_subseqs)[:ns]
            rows = ds.subseq_idx[order].reshape(-1)
            n_items = ns
        else:
            seq_len = 1
            n = (len(ds) // n_dev) * n_dev
            if n == 0:
                raise ValueError(
                    f"train split has {len(ds)} samples for {n_dev} devices; "
                    "too few for the sharded layout"
                )
            rows = rng.permutation(len(ds))[:n]
            n_items = n
        labels_grouped = np.asarray(ds.labels)[rows]
        self.train_group = {
            "rows": rows,
            "n_items": n_items,  # units (subsequences or samples)
            "seq_len": seq_len,
            "labels_grouped": labels_grouped.reshape(n_dev, -1),
        }
        host = {
            loc: {m: np.asarray(a)[rows] for m, a in mods.items()}
            for loc, mods in ds.data.items()
        }
        self.device_data["train"] = dist.put_row_sharded(host, self.mesh_plan)
        self.device_labels["train"] = dist.put_row_sharded(jnp.asarray(labels_grouped), self.mesh_plan)

    def state_plan(self, state):
        """Place the train state on the mesh -> (state, shardings-or-None).
        DP replicates; TP (model axis) places params/stats/moments by the
        Megatron rules in parallel/tp.py."""
        if self.mesh_plan is not None and self.mesh_plan.mp > 1:
            from focal_tpu.parallel import tp

            sh = tp.state_shardings(state, self.mesh_plan)
            if dist.process_count() > 1:
                # multi-process: device_put cannot scatter to non-addressable
                # devices; a jitted identity with out_shardings forms the
                # global TP-sharded arrays from equal per-process host values
                state = jax.jit(lambda t: t, out_shardings=sh)(state)
            else:
                state = jax.device_put(state, sh)
            logging.info(
                f"= TP: {tp.sharded_leaf_count(state, self.mesh_plan)} "
                "model-sharded state leaves"
            )
            return state, sh
        return dist.put_replicated_global(state, self.mesh_plan), None

    def eval_plan(self, split):
        """Static full-coverage batch schedule for a split: always built from
        a dedicated unshuffled, padded loader (the train loader itself
        shuffles and drops the ragged tail). With the sharded train layout
        the train plan iterates local row positions per shard instead."""
        if split not in self._eval_plans:
            if split == "train" and self.data_layout == "sharded":
                self._eval_plans[split] = ev.ShardedEvalPlan(
                    self.train_group["labels_grouped"],
                    self.train_loader.batch_size,
                    self.mesh_plan,
                )
                return self._eval_plans[split]
            from focal_tpu.data.loader import DeviceDataLoader

            base = {"train": self.train_loader, "val": self.val_loader, "test": self.test_loader}[split]
            loader = DeviceDataLoader(
                base.dataset, base.batch_size, shuffle=False, drop_last=False,
                sequence=base.sequence, seed=self.args.seed,
            )
            self._eval_plans[split] = ev.EvalPlan(loader, self.mesh_plan)
        return self._eval_plans[split]

    def sample_freq_batch(self, batch_size=2):
        """A tiny freq-domain batch for model init."""
        ds = self.train_loader.dataset
        batch = {
            loc: {m: jnp.asarray(a[:batch_size]) for m, a in mods.items()}
            for loc, mods in ds.data.items()
        }
        return self.augmenter.no(batch)

    def epochs(self, scheduler_key):
        if getattr(self.args, "epochs", None):
            return self.args.epochs
        return self.args.dataset_config[scheduler_key]["train_epochs"]


def _epoch_rng(args):
    return jax.random.key(args.seed)


def _block_size(args, val_epochs, remaining_epochs):
    """Max epochs per device call: a whole val block when the run is long
    enough to pay for the second compiled variant; -epochs_per_call
    overrides. Actual per-iteration block sizes never cross a validation
    boundary (see _next_block)."""
    override = getattr(args, "epochs_per_call", 0) or 0
    if override:
        return max(1, min(override, val_epochs))
    if val_epochs > 1 and remaining_epochs >= 5 * val_epochs:
        return val_epochs
    return 1


def _next_block(epoch, k, val_epochs, train_epochs):
    """Epochs to run before the next stop point, preserving the reference's
    validation cadence (after epochs 0, val_epochs, 2*val_epochs, ...)."""
    # the next epoch label requiring validation: smallest l >= epoch with
    # l % val_epochs == 0
    next_val = epoch if epoch % val_epochs == 0 else epoch + (val_epochs - epoch % val_epochs)
    return max(1, min(k, next_val + 1 - epoch, train_epochs - epoch))


def _nan_guard(train_loss, stage, epoch):
    """Failure detection: stop on divergence instead of burning the rest of a
    6000-epoch schedule. A `_resume` checkpoint from the last healthy val
    point always exists (the reference has no failure handling; SURVEY §5)."""
    if not np.isfinite(train_loss):
        logging.error(f"[{stage}] non-finite train loss at epoch {epoch}; aborting. "
                      f"Restart from the _resume checkpoint with -resume.")
        raise FloatingPointError(f"{stage} diverged at epoch {epoch}: loss={train_loss}")


def supervised_train(args):
    run = Run(args)
    train_epochs = (
        args.epochs if getattr(args, "epochs", None) else args.dataset_config[args.model]["lr_scheduler"]["train_epochs"]
    )
    tx_builder = lambda params: build_optimizer(
        args, params, steps_per_epoch=len(run.train_loader), epochs_override=getattr(args, "epochs", None)
    )
    return _classifier_loop(args, run, train_epochs, fixed_aug=True, tx_builder=tx_builder, stage_name="supervised")


def finetune(args):
    run = Run(args)
    train_epochs = (
        args.epochs
        if getattr(args, "epochs", None)
        else args.dataset_config[args.learn_framework]["finetune_lr_scheduler"]["train_epochs"]
    )
    tx_builder = lambda params: build_optimizer(
        args, params, steps_per_epoch=len(run.train_loader), epochs_override=getattr(args, "epochs", None)
    )
    return _classifier_loop(args, run, train_epochs, fixed_aug=False, tx_builder=tx_builder, stage_name="finetune")


def _classifier_loop(args, run, train_epochs, fixed_aug, tx_builder, stage_name):
    """Shared supervised/finetune loop (they differ in augmentation + init).

    Training runs as ONE jitted call per epoch (on-device shuffle +
    lax.scan over steps): per-step host dispatch through a tunneled TPU costs
    orders of magnitude more than the step itself."""
    sample = run.sample_freq_batch()
    rng = _epoch_rng(args)
    # init with a throwaway tx to create params, then rebuild with freeze mask
    import optax

    state = init_state(args, run.model, sample, optax.identity(), rng)
    if getattr(args, "init_weight", None):
        logging.info(f"= Initialising params from {args.init_weight}")
        state = ckpt.load_params_into(state, args.init_weight, load_class_layer=True)
    if stage_name == "finetune":
        # load the pretrained backbone minus the class layer
        _, pretrain_latest = checkpoint_paths(args, stage="pretrain")
        logging.info(f"= Loading pretrained backbone from {pretrain_latest}")
        state = ckpt.load_params_into(state, pretrain_latest, load_class_layer=False)
    tx, lr_fn = tx_builder(state.params)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    state, state_sh = run.state_plan(state)
    logging.info(f"= Model params: {param_count(state.params):,}")

    n_items = (
        run.train_group["n_items"] if run.data_layout == "sharded" else len(run.train_loader.dataset)
    )

    if run.streaming:
        from focal_tpu.data import streaming as strm

        streaming_fn = strm.make_streaming_classifier_fn(
            run.model, run.augmenter,
            host_data=run.host_train_data,
            host_labels=run.train_loader.dataset.labels,
            n_items=n_items,
            batch_size=run.train_loader.batch_size,
            fixed_aug=fixed_aug,
            mesh_plan=run.mesh_plan,
            seed=args.seed + 29,
            block_steps=getattr(args, "stream_block_steps", 0) or strm.BLOCK_STEPS,
            state_shardings=state_sh,
        )

    def _make_fn(k):
        if run.streaming:
            return streaming_fn  # one epoch per call; blocks amortize dispatch
        return make_classifier_epoch_fn(
            run.model,
            run.augmenter,
            n_items=n_items,
            batch_size=run.train_loader.batch_size,
            fixed_aug=fixed_aug,
            mesh_plan=run.mesh_plan,
            epochs_per_call=k,
            data_layout=run.data_layout,
            state_shardings=state_sh,
        )

    fwd_class = dist.sync_first_call(
        ev.make_batched_forward(run.model, run.augmenter, "class", run.mesh_plan,
                                state_shardings=state_sh),
        "fwd_class",
    )

    best_path, latest_path = checkpoint_paths(args)
    resume_path = latest_path.replace("_latest", "_resume")
    val_epochs = args.val_epochs or 5
    best_val_acc = -1.0
    start_epoch = 0
    if getattr(args, "resume", False):
        ckpt.check_meta(resume_path, {"grad_accum": getattr(args, "grad_accum", 1) or 1})
        state, extra = ckpt.restore_state(
            resume_path, state, extra_template={"epoch": np.asarray(0), "best": np.asarray(0.0)}
        )
        start_epoch = int(extra["epoch"]) + 1
        best_val_acc = float(extra["best"])
        logging.info(f"= Resumed from {resume_path} at epoch {start_epoch}, best {best_val_acc:.5f}")
    step_rng = jax.random.key(args.seed + 1)
    data, labels = run.device_data["train"], run.device_labels["train"]

    # one device call per val block when the run is long enough to amortise
    # the extra compile (per-call dispatch latency dominates tiny epochs);
    # block sizes never cross a validation boundary, so the reference's val
    # cadence (epochs 0, val_epochs, 2*val_epochs, ...) is preserved
    # streaming advances exactly one epoch per call (block dispatch
    # already amortizes per-call latency)
    k = 1 if run.streaming else _block_size(args, val_epochs, train_epochs - start_epoch)
    epoch_fns = {}

    start = time.time()
    block_t0, block_windows = time.time(), 0
    epoch = start_epoch
    profiled = False
    while epoch < train_epochs:
        blk = _next_block(epoch, k, val_epochs, train_epochs)
        if blk not in epoch_fns:
            epoch_fns[blk] = dist.sync_first_call(_make_fn(blk), f"epoch_fn_{blk}")
        profile_now = args.profile_dir and not profiled and epoch > start_epoch
        if profile_now:
            blk = 1  # trace a single epoch, not a whole block
            if blk not in epoch_fns:
                epoch_fns[blk] = dist.sync_first_call(_make_fn(blk), f"epoch_fn_{blk}")
            jax.profiler.start_trace(args.profile_dir)
        state, epoch_loss, _ = epoch_fns[blk](state, data, labels, step_rng)
        block_windows += epoch_fns[blk].windows_per_epoch * blk
        if profile_now:
            jax.block_until_ready(epoch_loss)
            jax.profiler.stop_trace()
            profiled = True
            logging.info(f"= Profiler trace written to {args.profile_dir}")
        epoch += blk
        if (epoch - 1) % val_epochs == 0 or epoch == train_epochs:
            epoch_label = epoch - 1
            train_loss = float(jax.device_get(epoch_loss))
            val_loss, val_metrics = ev.eval_supervised(
                args, state, fwd_class, run.eval_plan("val"), run.device_data["val"]
            )
            test_loss, test_metrics = ev.eval_supervised(
                args, state, fwd_class, run.eval_plan("test"), run.device_data["test"]
            )
            _nan_guard(train_loss, stage_name, epoch_label)
            dt = time.time() - block_t0
            logging.info(
                f"[{stage_name}] epoch {epoch_label}: train loss {train_loss:.5f} "
                f"({block_windows / max(dt, 1e-9):.1f} windows/s)"
            )
            ev.log_val_test(stage_name, epoch_label, val_loss, val_metrics, test_loss, test_metrics)
            # multi-process: ALL processes call save (orbax's save is a
            # cross-process collective; the primary host writes the data)
            ckpt.save_state(latest_path, state)
            ckpt.save_state(
                resume_path, state,
                extra={"epoch": np.asarray(epoch_label), "best": np.asarray(best_val_acc)},
                meta={"grad_accum": getattr(args, "grad_accum", 1) or 1},
            )
            if val_metrics[0] > best_val_acc:
                best_val_acc = val_metrics[0]
                ckpt.save_state(best_path, state)
            block_t0, block_windows = time.time(), 0
    logging.info(f"[{stage_name}] total time {time.time() - start:.1f}s, best val acc {best_val_acc:.5f}")
    return state, best_val_acc


def pretrain(args):
    run = Run(args)
    train_epochs = (
        args.epochs
        if getattr(args, "epochs", None)
        else args.dataset_config[args.learn_framework]["pretrain_lr_scheduler"]["train_epochs"]
    )
    sample = run.sample_freq_batch()
    rng = _epoch_rng(args)
    import optax

    state = init_state(args, run.model, sample, optax.identity(), rng)
    if getattr(args, "init_weight", None):
        logging.info(f"= Initialising params from {args.init_weight}")
        state = ckpt.load_params_into(state, args.init_weight, load_class_layer=True)
    # contrastive accumulation: the epoch fn gathers features across the
    # accumulation window and updates once per cycle (GradCache two-pass;
    # steps.make_pretrain_epoch_fn) — unless disabled or streaming, where the
    # per-micro MultiSteps fallback applies (negatives stay per-micro-batch)
    grad_accum = max(1, getattr(args, "grad_accum", 1) or 1)
    accum_gather = grad_accum > 1 and not getattr(args, "no_accum_gather", False)
    updates_per_epoch = len(run.train_loader)
    if getattr(args, "ragged_tail", False) and not run.streaming:
        # the tail step is one extra optimizer update per epoch; the
        # epoch-granular schedule must keep pacing by TRUE epochs (the
        # reference steps its scheduler once per epoch regardless of the
        # sampler's batch count)
        tl = run.train_loader
        units = tl.dataset.num_subseqs if tl.sequence else len(tl.dataset)
        per_units = (
            max(1, tl.batch_size // args.dataset_config["seq_len"]) if tl.sequence
            else min(tl.batch_size, units)
        )
        tail = units % per_units
        # mirror steps.make_pretrain_epoch_fn: a 1-subsequence tail is
        # dropped (degenerate ranking loss)
        if tail >= 2 or (tail and not tl.sequence):
            updates_per_epoch += 1
    tx, _ = build_optimizer(
        args, state.params, steps_per_epoch=updates_per_epoch,
        epochs_override=getattr(args, "epochs", None), accum_in_step=accum_gather,
    )
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    state, state_sh = run.state_plan(state)
    logging.info(f"= Model params: {param_count(state.params):,}")

    focal_loss = make_focal_loss(args)
    train_ds = run.train_loader.dataset
    n_items = (
        run.train_group["n_items"]
        if run.data_layout == "sharded"
        else (train_ds.num_subseqs if run.train_loader.sequence else len(train_ds))
    )
    # attribution arms (-py_aug_draws / -ragged_tail): narrow by design —
    # replicated single-mesh layout, no accumulation, no streaming
    py_draws = bool(getattr(args, "py_aug_draws", False))
    ragged_tail = bool(getattr(args, "ragged_tail", False))
    if (py_draws or ragged_tail) and (
        run.streaming or run.data_layout == "sharded" or grad_accum > 1
    ):
        raise ValueError(
            "-py_aug_draws/-ragged_tail are attribution arms for the "
            "replicated single-step layout (no streaming/sharded/grad_accum)"
        )
    aug_id_table = None
    if py_draws:
        import random as py_random

        seq_len = args.dataset_config["seq_len"] if run.train_loader.sequence else 1
        per = max(1, run.train_loader.batch_size // seq_len)
        steps = max(1, n_items // per)
        cols = steps + (1 if ragged_tail and n_items % per else 0)
        n_augs = len(run.augmenter.time_aug_names) + len(run.augmenter.freq_aug_names)
        draws = py_random.Random(args.seed)
        aug_id_table = np.asarray(
            [[[draws.randrange(n_augs) for _ in range(2)] for _ in range(cols)]
             for _ in range(train_epochs)],
            dtype=np.int32,
        )
        logging.info(
            f"= -py_aug_draws: host Python-random augmenter selection table "
            f"[{train_epochs}, {cols}, 2] over {n_augs} augmenters"
        )

    if run.streaming:
        from focal_tpu.data import streaming as strm

        streaming_fn = strm.make_streaming_pretrain_fn(
            run.model, run.augmenter, focal_loss,
            host_data=run.host_train_data,
            n_units=n_items,
            batch_size=run.train_loader.batch_size,
            subseq_idx=train_ds.subseq_idx if run.train_loader.sequence else None,
            mesh_plan=run.mesh_plan,
            fused_views=not getattr(args, "no_fused_views", False),
            seed=args.seed + 29,
            block_steps=getattr(args, "stream_block_steps", 0) or strm.BLOCK_STEPS,
            grad_accum=grad_accum,
            accum_gather=accum_gather,
            state_shardings=state_sh,
        )

    def _make_fn(k):
        if run.streaming:
            return streaming_fn  # one epoch per call; blocks amortize dispatch
        return make_pretrain_epoch_fn(
            run.model,
            run.augmenter,
            focal_loss,
            n_items=n_items,
            batch_size=run.train_loader.batch_size,
            subseq_idx=train_ds.subseq_idx if run.train_loader.sequence else None,
            mesh_plan=run.mesh_plan,
            fused_views=not getattr(args, "no_fused_views", False),
            epochs_per_call=k,
            data_layout=run.data_layout,
            state_shardings=state_sh,
            grad_accum=grad_accum,
            accum_gather=accum_gather,
            aug_id_table=aug_id_table,
            ragged_tail=ragged_tail,
        )
    loss_fn = dist.sync_first_call(
        ev.make_batched_pretrain_loss(run.model, run.augmenter, focal_loss, run.mesh_plan,
                                      state_shardings=state_sh),
        "pretrain_loss",
    )
    fwd_feat = dist.sync_first_call(
        ev.make_batched_forward(run.model, run.augmenter, "feat", run.mesh_plan,
                                state_shardings=state_sh),
        "fwd_feat",
    )
    # KNN features come from the train split, whose layout varies: row-sharded
    # (shard-local gathers) or streaming (host-fed blocks)
    if run.streaming:
        sfwd = strm.make_streaming_forward(
            run.model, run.augmenter, "feat",
            host_data=run.host_train_data, mesh_plan=run.mesh_plan,
            batch_size=run.train_loader.batch_size, n_rows=len(train_ds),
            state_shardings=state_sh,
        )
        fwd_feat_train = lambda state, data, idx: sfwd(state)
        knn_plan = strm.StreamingEvalPlan(train_ds.labels, sfwd)
    elif run.data_layout == "sharded":
        fwd_feat_train = dist.sync_first_call(
            ev.make_sharded_batched_forward(run.model, run.augmenter, "feat", run.mesh_plan),
            "fwd_feat_train",
        )
        knn_plan = run.eval_plan("train")
    else:
        fwd_feat_train = fwd_feat
        knn_plan = run.eval_plan("train")

    best_path, latest_path = checkpoint_paths(args)
    resume_path = latest_path.replace("_latest", "_resume")
    val_epochs = args.val_epochs or 10
    best_val_loss = np.inf
    start_epoch = 0
    if getattr(args, "resume", False):
        ckpt.check_meta(resume_path, {"grad_accum": getattr(args, "grad_accum", 1) or 1})
        state, extra = ckpt.restore_state(
            resume_path, state, extra_template={"epoch": np.asarray(0), "best": np.asarray(0.0)}
        )
        start_epoch = int(extra["epoch"]) + 1
        best_val_loss = float(extra["best"])
        logging.info(f"= Resumed from {resume_path} at epoch {start_epoch}, best {best_val_loss:.5f}")
    step_rng = jax.random.key(args.seed + 1)
    eval_rng = jax.random.key(args.seed + 2)
    data = run.device_data["train"]

    # streaming advances exactly one epoch per call (block dispatch
    # already amortizes per-call latency)
    k = 1 if run.streaming else _block_size(args, val_epochs, train_epochs - start_epoch)
    epoch_fns = {}

    start = time.time()
    block_t0, block_windows = time.time(), 0
    epoch = start_epoch
    profiled = False
    while epoch < train_epochs:
        blk = _next_block(epoch, k, val_epochs, train_epochs)
        if blk not in epoch_fns:
            epoch_fns[blk] = dist.sync_first_call(_make_fn(blk), f"epoch_fn_{blk}")
        profile_now = args.profile_dir and not profiled and epoch > start_epoch
        if profile_now:
            blk = 1  # trace a single epoch, not a whole block
            if blk not in epoch_fns:
                epoch_fns[blk] = dist.sync_first_call(_make_fn(blk), f"epoch_fn_{blk}")
            jax.profiler.start_trace(args.profile_dir)
        state, epoch_loss = epoch_fns[blk](state, data, step_rng)
        block_windows += epoch_fns[blk].windows_per_epoch * blk
        if profile_now:
            jax.block_until_ready(epoch_loss)
            jax.profiler.stop_trace()
            profiled = True
            logging.info(f"= Profiler trace written to {args.profile_dir}")
        epoch += blk
        if (epoch - 1) % val_epochs == 0 or epoch == train_epochs:
            epoch_label = epoch - 1
            train_loss = float(jax.device_get(epoch_loss))
            estimator = ev.compute_knn(
                state, fwd_feat_train, knn_plan, data, backend=getattr(args, "knn_backend", "sklearn")
            )
            val_loss, val_metrics = ev.eval_pretrained(
                args, state, fwd_feat, loss_fn, estimator,
                run.eval_plan("val"), run.device_data["val"], jax.random.fold_in(eval_rng, epoch_label),
            )
            test_loss, test_metrics = ev.eval_pretrained(
                args, state, fwd_feat, loss_fn, estimator,
                run.eval_plan("test"), run.device_data["test"], jax.random.fold_in(eval_rng, epoch_label + 1),
            )
            _nan_guard(train_loss, "pretrain", epoch_label)
            dt = time.time() - block_t0
            logging.info(
                f"[pretrain] epoch {epoch_label}: train loss {train_loss:.5f} "
                f"({block_windows / max(dt, 1e-9):.1f} windows/s)"
            )
            ev.log_val_test("pretrain", epoch_label, val_loss, val_metrics, test_loss, test_metrics)
            # backbone-only saves (reference: pretrain.py:94-100); on
            # multi-process meshes ALL processes call save (orbax collective)
            ckpt.save_params(latest_path, state.params, state.batch_stats)
            ckpt.save_state(
                resume_path, state,
                extra={"epoch": np.asarray(epoch_label), "best": np.asarray(best_val_loss)},
                meta={"grad_accum": getattr(args, "grad_accum", 1) or 1},
            )
            if val_loss < best_val_loss:
                best_val_loss = val_loss
                ckpt.save_params(best_path, state.params, state.batch_stats)
            block_t0, block_windows = time.time(), 0
    logging.info(f"[pretrain] total time {time.time() - start:.1f}s, best val loss {best_val_loss:.5f}")
    return state, best_val_loss
