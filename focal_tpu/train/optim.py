"""Optimizers and learning-rate schedules.

Schedule semantics replicate the timm epoch-granular schedulers the reference
uses (reference: src/train_utils/lr_scheduler.py:4-47): cosine with
warmup-prefix and cycle_limit=1, and step decay — expressed as pure
``lr(epoch)`` functions and mapped onto optax via steps_per_epoch.

Optimizer parity (reference: src/train_utils/optimizer.py:3-36): Adam couples
weight decay into the gradient (torch Adam), AdamW decouples it. Gradient
clipping honours the recipe's clip_grad only when -clip_grad is passed — the
reference declares it but never applies it.
"""

import math

import jax.numpy as jnp
import optax


def make_epoch_schedule(scheduler_config, optimizer_config):
    """Return a pure lr(epoch) function with timm semantics."""
    name = scheduler_config["name"]
    base_lr = float(optimizer_config["start_lr"])
    warmup_lr = float(optimizer_config.get("warmup_lr", 0.0))
    min_lr = float(optimizer_config.get("min_lr", 0.0))
    warmup_t = int(scheduler_config.get("warmup_epochs", 0))
    warmup_prefix = bool(scheduler_config.get("warmup_prefix", False))
    train_epochs = int(scheduler_config["train_epochs"])

    if name == "cosine":
        # reference passes t_initial = train_epochs - warmup when warmup_prefix
        t_initial = train_epochs - warmup_t if warmup_prefix else train_epochs

        def lr(epoch):
            epoch = jnp.asarray(epoch, jnp.float32)
            warm = warmup_lr + epoch * ((base_lr - warmup_lr) / max(warmup_t, 1))
            t = epoch - warmup_t if warmup_prefix else epoch
            cos = min_lr + 0.5 * (base_lr - min_lr) * (1.0 + jnp.cos(math.pi * t / t_initial))
            main = jnp.where(t < t_initial, cos, min_lr)
            return jnp.where(epoch < warmup_t, warm, main)

        return lr

    if name == "step":
        decay_t = int(scheduler_config["decay_epochs"])
        decay_rate = float(scheduler_config["decay_rate"])

        def lr(epoch):
            epoch = jnp.asarray(epoch, jnp.float32)
            warm = warmup_lr + epoch * ((base_lr - warmup_lr) / max(warmup_t, 1))
            main = base_lr * decay_rate ** jnp.floor(epoch / decay_t)
            return jnp.where(epoch < warmup_t, warm, main)

        return lr

    raise ValueError(f"Unknown LR scheduler: {name}")


def _stage_configs(args):
    """Pick the optimizer/scheduler yaml sections for the current stage
    (reference: optimizer.py:5-12, lr_scheduler.py:8-19)."""
    if args.train_mode in {"supervised"}:
        section = args.dataset_config[args.model]
        return section["optimizer"], section["lr_scheduler"]
    section = args.dataset_config[args.learn_framework]
    if args.stage == "pretrain":
        return section["pretrain_optimizer"], section["pretrain_lr_scheduler"]
    if args.stage == "finetune":
        return section["finetune_optimizer"], section["finetune_lr_scheduler"]
    raise ValueError(f"No optimizer defined for stage {args.stage}")


def _path_contains(path, needles):
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(str(n) for n in names)
    return any(needle in joined for needle in needles)


def trainable_mask(params, args):
    """True = trainable. Encodes the reference's freezing rules:
    * pretrain freezes any 'patch_embed' params (weight_utils.py:85-94);
    * finetune trains only class_layer + mod_fusion_layer for FOCAL
      (weight_utils.py:63-82)."""
    import jax

    if args.stage == "finetune" and args.train_mode != "supervised":
        needles = ("class_layer", "mod_fusion_layer")
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _path_contains(path, needles), params
        )
    if args.stage == "pretrain" and args.train_mode != "supervised":
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not _path_contains(path, ("patch_embed",)), params
        )
    return jax.tree_util.tree_map(lambda _: True, params)


def build_optimizer(args, params, steps_per_epoch, epochs_override=None, accum_in_step=False):
    """Create (optax tx, lr(epoch) fn). The tx maps global step -> epoch.

    With ``args.grad_accum = k > 1`` the whole chain is wrapped in
    ``optax.MultiSteps``: gradients of k consecutive micro-batches are
    averaged on device and the parameters update once per k steps —
    effective batch = k x batch_size at one micro-batch's activation
    memory. The inner schedule count then advances once per EFFECTIVE
    update, so the epoch mapping divides by steps_per_epoch / k.

    accum_in_step=True (FOCAL pretrain feature-gather path): the TRAIN STEP
    itself accumulates over k micro-batches and calls the optimizer once per
    effective update, so no MultiSteps wrapper is added; ``step`` then counts
    effective updates and the epoch mapping uses steps_per_epoch // k (the
    gather drops the ragged micro-step tail, so cycles never straddle epochs).
    """
    grad_accum = max(1, int(getattr(args, "grad_accum", 1) or 1))
    if grad_accum > 1 and not accum_in_step and steps_per_epoch % grad_accum != 0:
        import logging

        if grad_accum > steps_per_epoch:
            logging.warning(
                f"= -grad_accum {grad_accum} exceeds steps_per_epoch "
                f"{steps_per_epoch}: some epochs will produce ZERO optimizer "
                "updates (accumulation cycles span epochs). Lower -grad_accum "
                "or raise -batch_size."
            )
        else:
            logging.warning(
                f"= steps_per_epoch {steps_per_epoch} is not divisible by "
                f"-grad_accum {grad_accum}: accumulation cycles straddle epoch "
                "boundaries, so the lr(epoch) mapping drifts slightly at them."
            )
    optimizer_config, scheduler_config = _stage_configs(args)
    if epochs_override:
        scheduler_config = dict(scheduler_config)
        scheduler_config["train_epochs"] = epochs_override
    lr_epoch = make_epoch_schedule(scheduler_config, optimizer_config)
    if getattr(args, "ref_lr_timing", False):
        # the reference loops call timm's scheduler.step(e) at epoch END, so
        # epoch e trains at lr(e-1) and epoch 0 at the constructor's lr(0)
        # (reference: src/train_utils/supervised_train.py:104 +
        # lr_scheduler.py:21-43)
        base_lr_epoch = lr_epoch
        lr_epoch = lambda e: base_lr_epoch(jnp.maximum(jnp.asarray(e) - 1, 0))
    if accum_in_step:
        eff_steps_per_epoch = max(1, steps_per_epoch // grad_accum)
    else:
        eff_steps_per_epoch = steps_per_epoch / grad_accum

    def lr_step(step):
        return lr_epoch(jnp.floor(step / eff_steps_per_epoch))

    wd = optimizer_config.get("weight_decay", 0.0)
    if isinstance(wd, dict) or hasattr(wd, "keys"):
        wd = wd[args.model]  # per-model dict (reference: optimizer.py:16-19)
    wd = float(wd)

    name = optimizer_config["name"]
    parts = []
    if getattr(args, "clip_grad", False) and optimizer_config.get("clip_grad"):
        parts.append(optax.clip_by_global_norm(float(optimizer_config["clip_grad"])))
    if name == "Adam":
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # L2-in-grad (torch Adam)
        parts.append(optax.scale_by_adam())
        parts.append(optax.scale_by_learning_rate(lr_step))
    elif name == "AdamW":
        parts.append(optax.scale_by_adam())
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # decoupled (torch AdamW)
        parts.append(optax.scale_by_learning_rate(lr_step))
    else:
        raise NotImplementedError(f"Optimizer {name} not implemented.")
    tx = optax.chain(*parts)

    mask = trainable_mask(params, args)
    if not all(jax_tree_all_true(mask)):
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=jax_tree_map_labels(mask),
        )
    if grad_accum > 1 and not accum_in_step:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx, lr_epoch


def jax_tree_all_true(mask):
    import jax

    return [bool(x) for x in jax.tree_util.tree_leaves(mask)]


def jax_tree_map_labels(mask):
    import jax

    return jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
