"""timm.models.layers.{trunc_normal_, DropPath} with published semantics."""

import torch
from torch import nn


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        tensor.normal_(mean, std)
        torch.clamp_(tensor, min=a * std + mean, max=b * std + mean)
    return tensor


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
