"""Shared building blocks for the backbones.

Functional counterparts of the reference's ConvModules / RecurrentModule /
FusionModules (reference: src/models/ConvModules.py:54-218,
src/models/RecurrentModule.py:5-31, src/models/FusionModules.py:7-140),
re-laid-out for TPU: convolutions run in NHWC (= [b, interval, spectrum,
channel]), BatchNorm/Dropout2d keep PyTorch defaults, and the GRU is a
flax scan over the (static, short) interval axis.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvLayer2D(nn.Module):
    """conv2d + batch_norm + GELU + channel dropout
    (reference: ConvModules.py:54-112; BN eps 1e-5 / momentum 0.1, Dropout2d)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    dropout_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=True,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        x = nn.gelu(x)
        # Dropout2d: zero whole channels -> broadcast over the spatial dims
        x = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2), deterministic=not train)(x)
        return x


class ConvBlock(nn.Module):
    """Per-(loc, mod) encoder: input conv (optionally strided for audio
    downsampling) -> N residual same-padding convs -> per-interval flatten ->
    Dense to out_channels (reference: ConvModules.py:115-218; the reference's
    1x1 Conv1d over flattened channels is an interval-wise Dense).

    Input  [b, i, s, c]  ->  Output [b, i_out, out_channels]
    (i_out = 1 when conv_lens[1][0] > 1 fuses the interval axis).
    """

    out_channels: int
    conv_lens: Sequence[Sequence[int]]
    num_inter_layers: int
    in_stride: Sequence[int] = (1, 1)
    dropout_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        half = self.out_channels // 2
        stride = tuple(self.in_stride) if not isinstance(self.in_stride, int) else (1, self.in_stride)
        padding = "SAME" if max(stride) == 1 else "VALID"
        x = ConvLayer2D(
            half, self.conv_lens[0], stride, padding, self.dropout_ratio, dtype=self.dtype
        )(x, train)

        for _ in range(self.num_inter_layers):
            x = x + ConvLayer2D(
                half, self.conv_lens[1], (1, 1), "SAME", self.dropout_ratio, dtype=self.dtype
            )(x, train)

        b, i, s, c = x.shape
        if self.conv_lens[1][0] > 1:
            # interval information already fused by tall kernels -> single step
            x = x.reshape(b, 1, i * s * c)
        else:
            x = x.reshape(b, i, s * c)
        # reference applies a kernel-1 Conv1d == per-interval Dense, no activation
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="out_proj")(x)
        return x


class BiGRU(nn.Module):
    """num_layers-layer bidirectional GRU, mean-pooled over time
    (reference: RecurrentModule.py:5-31 — torch.nn.GRU(bidirectional=True),
    inter-layer dropout, mean over intervals).

    Input [b, i, c] -> Output [b, 2 * hidden].
    """

    hidden: int
    num_layers: int = 2
    dropout_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        # GRU state math stays float32: tiny tensors, recurrent error compounds.
        # Fully unrolled: the interval axis is short and static (10 on MOD),
        # and unrolling lets XLA pipeline the small per-step matmuls instead
        # of serialising a scan.
        x = x.astype(jnp.float32)
        unroll = x.shape[1]
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden), name=f"gru{layer}_fwd", unroll=unroll)
            bwd = nn.RNN(
                nn.GRUCell(self.hidden), name=f"gru{layer}_bwd", reverse=True, keep_order=True, unroll=unroll
            )
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            if layer < self.num_layers - 1:
                # torch GRU applies dropout between stacked layers only
                x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return jnp.mean(x, axis=1)


class MeanFusion(nn.Module):
    """Mean over the sensor/location axis (reference: FusionModules.py:7-60)."""

    @nn.compact
    def __call__(self, x):
        # x: [b, i, n_sensors, c] -> [b, i, c]
        return jnp.mean(x, axis=2)


class AttentionFusion(nn.Module):
    """LayerNorm + mean-query multi-head attention pooling
    (reference: FusionModules.py:63-140 TransformerFusionBlock).

    Input [b, i, n, c] -> Output [b, i, c]: the mean over the n fused items
    queries them through MHA.
    """

    num_heads: int
    dropout_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b, i, n, c = x.shape
        x = x.reshape(b * i, n, c)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        query = jnp.mean(x, axis=1, keepdims=True)
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout_ratio,
            deterministic=not train,
            dtype=self.dtype,
        )(query, x, x)
        return out.reshape(b, i, c)


class ProjectionHead(nn.Module):
    """Two-layer MLP projector (reference: DeepSense.py:85-91 /
    SW_Transformer.py:155-161: Linear -> ReLU -> Linear)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class ClassHead(nn.Module):
    """Linear (supervised/finetune) or MLP (SSL head) classifier
    (reference: DeepSense.py:95-106)."""

    num_classes: int
    fc_dim: int
    linear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.linear:
            return nn.Dense(self.num_classes, dtype=self.dtype)(x)
        x = nn.Dense(self.fc_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
