"""Import the reference's PyTorch modules for parity tests and benchmarks.

The upstream code at /root/reference/src is torch-only except for two timm
symbols (``DropPath``, ``trunc_normal_`` — reference:
src/models/SwinModules.py:14, SW_Transformer.py:8). timm is not installed
here, so a minimal shim implementing those two published semantics is
installed into ``sys.modules`` before importing. The reference path is only
on ``sys.path`` for the duration of the import so repo modules with common
names (``test``, ``train``, ``models``...) are never shadowed afterwards.
"""

import importlib
import sys
import types

REF_SRC = "/root/reference/src"


def _install_timm_shim():
    """Provide timm.models.layers.{DropPath, trunc_normal_} on torch."""
    if "timm.models.layers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(min=mean + a * std, max=mean + b * std)
        return tensor

    class DropPath(nn.Module):
        """Per-sample stochastic depth (drop whole residual branches)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = float(drop_prob)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers


def import_reference(module_name):
    """Import a module from the reference tree (e.g. "models.DeepSense").

    Keeps sys.path clean: REF_SRC is prepended only while the import runs.
    Installs the timm shim first so the Swin stack imports without timm.
    """
    _install_timm_shim()
    inserted = REF_SRC not in sys.path
    if inserted:
        sys.path.insert(0, REF_SRC)
    try:
        return importlib.import_module(module_name)
    finally:
        if inserted and REF_SRC in sys.path:
            sys.path.remove(REF_SRC)
