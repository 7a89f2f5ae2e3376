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
import jax
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
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact erf
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


class GRULayer(nn.Module):
    """One GRU layer restructured for the MXU: the input projections for ALL
    timesteps run as a single large matmul up front; only the small
    hidden-to-hidden matmul stays in the (fully unrolled) recurrence.

    Gate math matches torch.nn.GRU: r = s(Wir x + Whr h), z = s(Wiz x + Whz h),
    n = tanh(Win x + r * (Whn h)), h' = (1-z) n + z h.

    Input [b, t, c] -> Output [b, t, hidden].
    """

    hidden: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        H = self.hidden
        wi = self.param("wi", nn.initializers.lecun_normal(), (C, 3 * H))
        bi = self.param("bi", nn.initializers.zeros_init(), (3 * H,))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        bh = self.param("bh", nn.initializers.zeros_init(), (3 * H,))

        xproj = x @ wi + bi  # [b, t, 3H] — one MXU-friendly matmul
        xproj = jnp.swapaxes(xproj, 0, 1)  # [t, b, 3H]

        def step(h, xp):
            hp = h @ wh + bh
            r = jax.nn.sigmoid(xp[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xp[..., H : 2 * H] + hp[..., H : 2 * H])
            n = jnp.tanh(xp[..., 2 * H :] + r * hp[..., 2 * H :])
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((B, H), x.dtype)
        _, ys = jax.lax.scan(step, h0, xproj, unroll=T)
        return jnp.swapaxes(ys, 0, 1)  # [b, t, H]


class BiGRULayer(nn.Module):
    """One bidirectional GRU layer with SEPARATE per-direction parameters
    (torch nn.GRU(bidirectional=True) semantics: weight_ih_l{k} and
    weight_ih_l{k}_reverse are independent — required for torch-checkpoint
    import parity). Params are stacked on a leading direction axis so the
    input projections for all timesteps and both directions run as one
    batched einsum; the recurrence advances a [2, b, H] state in one scan.

    Gate math matches torch.nn.GRU (both bias vectors kept: b_hn sits inside
    the r* term). Input [b, t, c] -> [b, t, 2H] (fwd ++ bwd, torch order).
    """

    hidden: int

    @nn.compact
    def __call__(self, x, out_mask=None):
        """out_mask: optional [t, 2, b, H] multiplier applied to each step's
        hidden state INSIDE the scan. Inter-layer dropout must enter here
        rather than as an elementwise op on the stacked [b, t, 2H] output:
        the TPU fusion emitter aborts (window.pad_low != 0) when it fuses an
        elementwise multiply into the unrolled scan's stacked-output slices,
        and optimization barriers do not block that fusion."""
        B, T, C = x.shape
        H = self.hidden
        wi = self.param("wi", nn.initializers.lecun_normal(), (2, C, 3 * H))
        bi = self.param("bi", nn.initializers.zeros_init(), (2, 3 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (2, H, 3 * H))
        bh = self.param("bh", nn.initializers.zeros_init(), (2, 3 * H))

        both = jnp.stack([x, x[:, ::-1]], axis=0)  # [2, b, t, C]
        # one MXU-friendly batched matmul for every timestep of each direction
        xproj = jnp.einsum("dbtc,dcg->tdbg", both, wi) + bi[:, None]  # [t, 2, b, 3H]

        def step(h, xp):  # h [2, b, H], xp [2, b, 3H] (+ mask [2, b, H])
            if out_mask is not None:
                xp, m = xp
            hp = jnp.einsum("dbh,dhg->dbg", h, wh) + bh[:, None]
            r = jax.nn.sigmoid(xp[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xp[..., H : 2 * H] + hp[..., H : 2 * H])
            n = jnp.tanh(xp[..., 2 * H :] + r * hp[..., 2 * H :])
            h = (1.0 - z) * n + z * h
            return h, h * m if out_mask is not None else h

        h0 = jnp.zeros((2, B, H), x.dtype)
        xs = xproj if out_mask is None else (xproj, out_mask)
        _, ys = jax.lax.scan(step, h0, xs, unroll=T)  # [t, 2, b, H]
        fwd = jnp.swapaxes(ys[:, 0], 0, 1)  # [b, t, H]
        bwd = jnp.swapaxes(ys[::-1, 1], 0, 1)
        return jnp.concatenate([fwd, bwd], axis=-1)


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
        # GRU state math stays float32: tiny tensors, recurrent error compounds
        x = x.astype(jnp.float32)
        H = self.hidden
        for layer in range(self.num_layers):
            # torch GRU applies dropout between stacked layers only. The mask
            # is drawn here (same bernoulli/keep-scale semantics as
            # nn.Dropout on the [b, t, 2H] output) but applied inside the
            # producing layer's scan — see BiGRULayer.out_mask for why.
            mask2 = None
            if train and self.dropout_ratio > 0.0 and layer < self.num_layers - 1:
                B, T = x.shape[0], x.shape[1]
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.dropout_ratio, (B, T, 2 * H)
                )
                m = keep.astype(jnp.float32) / (1.0 - self.dropout_ratio)
                # concat output [b,t,:H] is fwd ys[t,0]; [b,t,H:] is bwd
                # ys[T-1-t,1] — align the mask with the scan's native order
                mf = jnp.transpose(m[..., :H], (1, 0, 2))  # [t, b, H]
                mb = jnp.transpose(m[..., H:], (1, 0, 2))[::-1]
                mask2 = jnp.stack([mf, mb], axis=1)  # [t, 2, b, H]
            x = BiGRULayer(H, name=f"gru{layer}")(x, out_mask=mask2)
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
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact erf
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
