"""Minimal timm stand-in for running the reference training loop here.

timm is not installed in this environment (and there is no egress). The
reference uses exactly four timm symbols (reference:
src/models/SwinModules.py:14, SW_Transformer.py:8,
src/train_utils/lr_scheduler.py:1-2); this package provides those four with
the published semantics — the scheduler math mirrors
focal_tpu/train/optim.py, whose stepping protocol is property-tested
against timm's documented behavior (tests/test_optim.py).
"""
