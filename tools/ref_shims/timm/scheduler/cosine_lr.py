"""CosineLRScheduler with the subset of timm semantics the reference uses
(reference: src/train_utils/lr_scheduler.py:22-34 — cycle_mul=1,
cycle_limit=1, t_in_epochs=True). Math mirrors the property-tested pure
schedule in focal_tpu/train/optim.py."""

import math


class CosineLRScheduler:
    def __init__(self, optimizer, t_initial, cycle_mul=1.0, lr_min=0.0,
                 warmup_lr_init=0.0, warmup_t=0, cycle_limit=1,
                 t_in_epochs=True, warmup_prefix=False):
        self.optimizer = optimizer
        self.t_initial = t_initial
        self.lr_min = lr_min
        self.warmup_lr_init = warmup_lr_init
        self.warmup_t = warmup_t
        self.warmup_prefix = warmup_prefix
        self.base_lrs = [g["lr"] for g in optimizer.param_groups]
        # timm applies the epoch-0 value at construction
        self._apply(self._values(0))

    def _values(self, t):
        out = []
        for base in self.base_lrs:
            if self.warmup_t and t < self.warmup_t:
                lr = self.warmup_lr_init + t * (base - self.warmup_lr_init) / max(self.warmup_t, 1)
            else:
                tt = t - self.warmup_t if self.warmup_prefix else t
                if tt < self.t_initial:
                    lr = self.lr_min + 0.5 * (base - self.lr_min) * (
                        1.0 + math.cos(math.pi * tt / self.t_initial)
                    )
                else:
                    lr = self.lr_min
            out.append(lr)
        return out

    def _apply(self, values):
        for g, lr in zip(self.optimizer.param_groups, values):
            g["lr"] = lr

    def step(self, epoch):
        # timm's Scheduler.step(epoch) applies get_epoch_values(epoch) — i.e.
        # lr(epoch). The reference loop calls step(epoch) at the END of epoch
        # e, so epoch e+1 trains at lr(e): the one-epoch lag is real timm
        # behavior and must be reproduced, not corrected.
        self._apply(self._values(epoch))
