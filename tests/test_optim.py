import numpy as np
import pytest

from focal_tpu.train.optim import make_epoch_schedule


def test_cosine_schedule_timm_semantics():
    """Golden values for timm CosineLRScheduler(t_initial=100-0, lr_min=1e-7,
    warmup_t=0, warmup_prefix=True, cycle_limit=1) as configured by the
    reference (lr_scheduler.py:21-34)."""
    sched = {"name": "cosine", "warmup_prefix": True, "warmup_epochs": 0, "train_epochs": 100}
    opt = {"start_lr": 1e-3, "warmup_lr": 1e-6, "min_lr": 1e-7}
    lr = make_epoch_schedule(sched, opt)
    # t=0 -> base lr
    assert np.isclose(float(lr(0)), 1e-3)
    # t=50 -> midpoint of cosine: lr_min + 0.5*(base-min)
    assert np.isclose(float(lr(50)), 1e-7 + 0.5 * (1e-3 - 1e-7), rtol=1e-6)
    # t=100 (past the single cycle) -> lr_min
    assert np.isclose(float(lr(100)), 1e-7)
    assert np.isclose(float(lr(150)), 1e-7)
    # monotone decreasing inside the cycle
    vals = [float(lr(t)) for t in range(0, 100, 10)]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_cosine_warmup():
    sched = {"name": "cosine", "warmup_prefix": True, "warmup_epochs": 5, "train_epochs": 105}
    opt = {"start_lr": 1e-3, "warmup_lr": 1e-6, "min_lr": 0.0}
    lr = make_epoch_schedule(sched, opt)
    # timm warmup: lr(t) = warmup_lr + t * (base - warmup_lr) / warmup_t
    assert np.isclose(float(lr(0)), 1e-6)
    assert np.isclose(float(lr(2)), 1e-6 + 2 * (1e-3 - 1e-6) / 5, rtol=1e-6)
    # first epoch after warmup = full base lr (warmup_prefix resets t)
    assert np.isclose(float(lr(5)), 1e-3)


def test_step_schedule():
    """Reference DeepSense supervised: step decay 0.2 every 300 epochs
    (MOD.yaml:89-96)."""
    sched = {"name": "step", "warmup_prefix": True, "warmup_epochs": 0,
             "train_epochs": 1500, "decay_epochs": 300, "decay_rate": 0.2}
    opt = {"start_lr": 1e-4, "warmup_lr": 1e-6, "min_lr": 1e-7}
    lr = make_epoch_schedule(sched, opt)
    assert np.isclose(float(lr(0)), 1e-4)
    assert np.isclose(float(lr(299)), 1e-4)
    assert np.isclose(float(lr(300)), 2e-5, rtol=1e-5)
    assert np.isclose(float(lr(600)), 4e-6, rtol=1e-5)


def test_trainable_mask_finetune():
    import jax
    from focal_tpu.train.optim import trainable_mask

    params = {
        "class_layer": {"Dense_0": {"kernel": np.zeros(1)}},
        "mod_fusion_layer": {"w": np.zeros(1)},
        "recurrent_audio": {"w": np.zeros(1)},
        "patch_embed_audio": {"w": np.zeros(1)},
    }

    class A:
        stage = "finetune"
        train_mode = "contrastive"

    mask = trainable_mask(params, A())
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]}
    assert flat["class_layer/Dense_0/kernel"] is True
    assert flat["mod_fusion_layer/w"] is True
    assert flat["recurrent_audio/w"] is False

    class B:
        stage = "pretrain"
        train_mode = "contrastive"

    mask = trainable_mask(params, B())
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]}
    assert flat["patch_embed_audio/w"] is False
    assert flat["recurrent_audio/w"] is True
