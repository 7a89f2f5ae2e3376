"""StepLRScheduler subset (reference: src/train_utils/lr_scheduler.py:36-44).
Math mirrors focal_tpu/train/optim.py's step schedule."""


class StepLRScheduler:
    def __init__(self, optimizer, decay_t, decay_rate=1.0, warmup_lr_init=0.0,
                 warmup_t=0, t_in_epochs=True):
        self.optimizer = optimizer
        self.decay_t = decay_t
        self.decay_rate = decay_rate
        self.warmup_lr_init = warmup_lr_init
        self.warmup_t = warmup_t
        self.base_lrs = [g["lr"] for g in optimizer.param_groups]
        self._apply(self._values(0))

    def _values(self, t):
        out = []
        for base in self.base_lrs:
            if self.warmup_t and t < self.warmup_t:
                lr = self.warmup_lr_init + t * (base - self.warmup_lr_init) / max(self.warmup_t, 1)
            else:
                lr = base * self.decay_rate ** (t // self.decay_t)
            out.append(lr)
        return out

    def _apply(self, values):
        for g, lr in zip(self.optimizer.param_groups, values):
            g["lr"] = lr

    def step(self, epoch):
        # real timm applies lr(epoch) here (see cosine_lr.py for the lag note)
        self._apply(self._values(epoch))
