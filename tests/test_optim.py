import math

import numpy as np
import pytest

from focal_tpu.train.optim import make_epoch_schedule


class TimmOracle:
    """Independent reimplementation of the timm scheduler stepping protocol
    the reference drives (timm.scheduler.{cosine_lr,step_lr} as constructed at
    reference src/train_utils/lr_scheduler.py:21-43; timm is not installed
    here, so this oracle re-derives the published update rules with separate
    code and state: constructor-time warmup init, per-epoch ``step(epoch)``,
    cycle accounting with cycle_mul=1/cycle_decay=1/k_decay=1).

    ``lr_for_epoch(e)`` returns the lr the reference's loop would actually
    train epoch e with: the loops call ``scheduler.step(epoch)`` at the END of
    each epoch (e.g. supervised_train.py:104), so epoch e>=1 runs at
    _get_lr(e-1) and epoch 0 runs at the constructor value. ``get_lr(t)`` is
    the raw timm value our pure schedule must match pointwise.
    """

    def __init__(self, name, base_lr, scheduler_config, optimizer_config):
        self.name = name
        self.base = base_lr
        self.min_lr = float(optimizer_config.get("min_lr", 0.0))
        self.warmup_lr_init = float(optimizer_config.get("warmup_lr", 0.0))
        self.warmup_t = int(scheduler_config.get("warmup_epochs", 0))
        self.warmup_prefix = bool(scheduler_config.get("warmup_prefix", False))
        train_epochs = int(scheduler_config["train_epochs"])
        if name == "cosine":
            self.t_initial = (
                train_epochs - self.warmup_t if self.warmup_prefix else train_epochs
            )
            self.cycle_limit = 1
        else:
            self.decay_t = int(scheduler_config["decay_epochs"])
            self.decay_rate = float(scheduler_config["decay_rate"])
        if self.warmup_t:
            self.warmup_step = (self.base - self.warmup_lr_init) / self.warmup_t
            self.current = self.warmup_lr_init  # timm updates groups at init
        else:
            self.warmup_step = 1.0
            self.current = self.base

    def get_lr(self, t):
        if t < self.warmup_t:
            return self.warmup_lr_init + t * self.warmup_step
        if self.name == "cosine":
            if self.warmup_prefix:
                t = t - self.warmup_t
            i = t // self.t_initial
            t_curr = t - i * self.t_initial
            if i < self.cycle_limit:
                return self.min_lr + 0.5 * (self.base - self.min_lr) * (
                    1 + math.cos(math.pi * t_curr / self.t_initial)
                )
            return self.min_lr
        return self.base * self.decay_rate ** (t // self.decay_t)

    def step(self, epoch):
        self.current = self.get_lr(epoch)


ORACLE_CONFIGS = [
    # (name, scheduler_config, optimizer_config) — spans every recipe shape:
    # the 3 MOD stages plus warmup/prefix corner cases
    ("cosine", {"train_epochs": 6000, "warmup_epochs": 0, "warmup_prefix": True},
     {"start_lr": 1e-3, "warmup_lr": 1e-6, "min_lr": 1e-7}),
    ("cosine", {"train_epochs": 200, "warmup_epochs": 10, "warmup_prefix": True},
     {"start_lr": 1e-4, "warmup_lr": 1e-6, "min_lr": 1e-7}),
    ("cosine", {"train_epochs": 100, "warmup_epochs": 7, "warmup_prefix": False},
     {"start_lr": 3e-4, "warmup_lr": 1e-5, "min_lr": 0.0}),
    ("step", {"train_epochs": 1500, "warmup_epochs": 0, "warmup_prefix": True,
              "decay_epochs": 300, "decay_rate": 0.2},
     {"start_lr": 1e-4, "warmup_lr": 1e-6, "min_lr": 1e-7}),
    ("step", {"train_epochs": 60, "warmup_epochs": 4, "warmup_prefix": False,
              "decay_epochs": 13, "decay_rate": 0.5},
     {"start_lr": 2e-3, "warmup_lr": 1e-5, "min_lr": 0.0}),
]


@pytest.mark.parametrize("name,sched,opt", ORACLE_CONFIGS)
def test_schedule_matches_timm_oracle(name, sched, opt):
    """Pointwise parity of the pure lr(epoch) with the timm stepping oracle
    over the whole run (plus past-the-end epochs)."""
    sched = dict(sched, name=name)
    lr = make_epoch_schedule(sched, opt)
    oracle = TimmOracle(name, float(opt["start_lr"]), sched, opt)
    epochs = int(sched["train_epochs"])
    probe = list(range(0, min(epochs, 300))) + [
        epochs - 2, epochs - 1, epochs, epochs + 1, epochs + 57
    ]
    for t in probe:
        np.testing.assert_allclose(
            float(lr(t)), oracle.get_lr(t), rtol=2e-5, atol=1e-9,
            err_msg=f"{name} config {sched} epoch {t}",
        )


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
