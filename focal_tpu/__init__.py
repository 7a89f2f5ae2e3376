"""FOCAL-TPU: a TPU-native JAX framework for multimodal time-series
contrastive learning (FOCAL, NeurIPS 2023).

Re-designed from scratch for TPU hardware:
  * the full train step (augmentation -> FFT -> model -> loss -> update) is a
    single jitted XLA program,
  * datasets are device-resident (batches are on-device gathers),
  * parallelism is expressed with jax.sharding.Mesh + NamedSharding,
  * models are flax.linen modules with bf16 compute on the MXU.

Capability parity target: tomoyoshki/focal (see SURVEY.md for file:line map).
"""

__version__ = "0.1.0"
