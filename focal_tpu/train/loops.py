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
from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated


class Run:
    """Everything a stage loop needs, built once."""

    def __init__(self, args):
        self.args = args
        self.mesh_plan = make_mesh_plan(getattr(args, "data_parallel", 0))
        self.train_loader = create_dataloader("train", args)
        self.val_loader = create_dataloader("val", args)
        self.test_loader = create_dataloader("test", args)
        logging.info(
            f"= Dataloaders: train {len(self.train_loader.dataset)} samples / "
            f"{len(self.train_loader)} steps, val {len(self.val_loader.dataset)}, "
            f"test {len(self.test_loader.dataset)}"
        )

        self.augmenter = build_augmenter(args)
        self.model = build_backbone(args)

        # device-resident split data (replicated over the mesh)
        self.device_data = {}
        self.device_labels = {}
        for name, loader in (
            ("train", self.train_loader),
            ("val", self.val_loader),
            ("test", self.test_loader),
        ):
            ds = loader.dataset
            self.device_data[name] = put_replicated(
                {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in ds.data.items()},
                self.mesh_plan,
            )
            self.device_labels[name] = put_replicated(jnp.asarray(ds.labels), self.mesh_plan)
        self._eval_plans = {}

    def eval_plan(self, split):
        """Static full-coverage batch schedule for a split: always built from
        a dedicated unshuffled, padded loader (the train loader itself
        shuffles and drops the ragged tail)."""
        if split not in self._eval_plans:
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
    if stage_name == "finetune":
        # load the pretrained backbone minus the class layer
        _, pretrain_latest = checkpoint_paths(args, stage="pretrain")
        logging.info(f"= Loading pretrained backbone from {pretrain_latest}")
        state = ckpt.load_params_into(state, pretrain_latest, load_class_layer=False)
    tx, lr_fn = tx_builder(state.params)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    state = put_replicated(state, run.mesh_plan)
    logging.info(f"= Model params: {param_count(state.params):,}")

    def _make_fn(k):
        return make_classifier_epoch_fn(
            run.model,
            run.augmenter,
            n_items=len(run.train_loader.dataset),
            batch_size=run.train_loader.batch_size,
            fixed_aug=fixed_aug,
            mesh_plan=run.mesh_plan,
            epochs_per_call=k,
        )

    fwd_class = ev.make_batched_forward(run.model, run.augmenter, "class", run.mesh_plan)

    best_path, latest_path = checkpoint_paths(args)
    resume_path = latest_path.replace("_latest", "_resume")
    val_epochs = args.val_epochs or 5
    best_val_acc = -1.0
    start_epoch = 0
    if getattr(args, "resume", False):
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
    k = _block_size(args, val_epochs, train_epochs - start_epoch)
    epoch_fns = {}

    start = time.time()
    block_t0, block_windows = time.time(), 0
    epoch = start_epoch
    profiled = False
    while epoch < train_epochs:
        blk = _next_block(epoch, k, val_epochs, train_epochs)
        if blk not in epoch_fns:
            epoch_fns[blk] = _make_fn(blk)
        profile_now = args.profile_dir and not profiled and epoch > start_epoch
        if profile_now:
            blk = 1  # trace a single epoch, not a whole block
            if blk not in epoch_fns:
                epoch_fns[blk] = _make_fn(blk)
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
            ckpt.save_state(latest_path, state)
            ckpt.save_state(
                resume_path, state, extra={"epoch": np.asarray(epoch_label), "best": np.asarray(best_val_acc)}
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
    tx, _ = build_optimizer(
        args, state.params, steps_per_epoch=len(run.train_loader), epochs_override=getattr(args, "epochs", None)
    )
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    state = put_replicated(state, run.mesh_plan)
    logging.info(f"= Model params: {param_count(state.params):,}")

    focal_loss = make_focal_loss(args)
    train_ds = run.train_loader.dataset
    def _make_fn(k):
        return make_pretrain_epoch_fn(
            run.model,
            run.augmenter,
            focal_loss,
            n_items=train_ds.num_subseqs,
            batch_size=run.train_loader.batch_size,
            subseq_idx=train_ds.subseq_idx,
            mesh_plan=run.mesh_plan,
            fused_views=not getattr(args, "no_fused_views", False),
            epochs_per_call=k,
        )
    loss_fn = ev.make_batched_pretrain_loss(run.model, run.augmenter, focal_loss, run.mesh_plan)
    fwd_feat = ev.make_batched_forward(run.model, run.augmenter, "feat", run.mesh_plan)
    knn_plan = run.eval_plan("train")

    best_path, latest_path = checkpoint_paths(args)
    resume_path = latest_path.replace("_latest", "_resume")
    val_epochs = args.val_epochs or 10
    best_val_loss = np.inf
    start_epoch = 0
    if getattr(args, "resume", False):
        state, extra = ckpt.restore_state(
            resume_path, state, extra_template={"epoch": np.asarray(0), "best": np.asarray(0.0)}
        )
        start_epoch = int(extra["epoch"]) + 1
        best_val_loss = float(extra["best"])
        logging.info(f"= Resumed from {resume_path} at epoch {start_epoch}, best {best_val_loss:.5f}")
    step_rng = jax.random.key(args.seed + 1)
    eval_rng = jax.random.key(args.seed + 2)
    data = run.device_data["train"]

    k = _block_size(args, val_epochs, train_epochs - start_epoch)
    epoch_fns = {}

    start = time.time()
    block_t0, block_windows = time.time(), 0
    epoch = start_epoch
    profiled = False
    while epoch < train_epochs:
        blk = _next_block(epoch, k, val_epochs, train_epochs)
        if blk not in epoch_fns:
            epoch_fns[blk] = _make_fn(blk)
        profile_now = args.profile_dir and not profiled and epoch > start_epoch
        if profile_now:
            blk = 1  # trace a single epoch, not a whole block
            if blk not in epoch_fns:
                epoch_fns[blk] = _make_fn(blk)
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
                state, fwd_feat, knn_plan, data, backend=getattr(args, "knn_backend", "sklearn")
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
            # backbone-only saves (reference: pretrain.py:94-100)
            ckpt.save_params(latest_path, state.params, state.batch_stats)
            ckpt.save_state(
                resume_path, state, extra={"epoch": np.asarray(epoch_label), "best": np.asarray(best_val_loss)}
            )
            if val_loss < best_val_loss:
                best_val_loss = val_loss
                ckpt.save_params(best_path, state.params, state.batch_stats)
            block_t0, block_windows = time.time(), 0
    logging.info(f"[pretrain] total time {time.time() - start:.1f}s, best val loss {best_val_loss:.5f}")
    return state, best_val_loss
