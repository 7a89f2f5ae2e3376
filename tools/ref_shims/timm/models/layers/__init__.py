"""timm.models.layers.{trunc_normal_, DropPath} with published semantics."""

import torch
from torch import nn


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    # timm's trunc_normal_ treats a/b as ABSOLUTE cutoffs and samples a true
    # truncated normal via inverse-CDF — the exact algorithm torch later
    # adopted as torch.nn.init.trunc_normal_, so delegate to it (a clamp
    # would instead pile ~4.6% of mass onto the bounds).
    return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


class DropPath(nn.Module):
    """Per-sample stochastic depth (identity in eval, scaled keep in train)."""

    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask
