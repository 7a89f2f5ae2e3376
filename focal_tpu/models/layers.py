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


class _ConvDecl(nn.Module):
    """Kernel/bias with nn.Conv's exact names, shapes and initializers, for
    the fused conv-tower path (checkpoint-compatible with ConvLayer2D)."""

    kh: int
    kw: int
    cin: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kh, self.kw, self.cin, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _BNDecl(nn.Module):
    """scale/bias params + mean/var batch_stats with nn.BatchNorm's names,
    shapes and init values."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class _ConvLayerDecl(nn.Module):
    """Parameter tree of one ConvLayer2D (Conv_0 + BatchNorm_0), declared
    without running the XLA ops — named ConvLayer2D_{k} by the caller so
    fused and unfused paths share checkpoints."""

    kh: int
    kw: int
    cin: int
    features: int

    @nn.compact
    def __call__(self):
        k, b = _ConvDecl(self.kh, self.kw, self.cin, self.features, name="Conv_0")()
        s, bb, mean, var = _BNDecl(self.features, name="BatchNorm_0")()
        return k, b, s, bb, mean, var


class ConvBlock(nn.Module):
    """Per-(loc, mod) encoder: input conv (optionally strided for audio
    downsampling) -> N residual same-padding convs -> per-interval flatten ->
    Dense to out_channels (reference: ConvModules.py:115-218; the reference's
    1x1 Conv1d over flattened channels is an interval-wise Dense).

    Input  [b, i, s, c]  ->  Output [b, i_out, out_channels]
    (i_out = 1 when conv_lens[1][0] > 1 fuses the interval axis).

    With use_pallas, train-mode forward+backward run as the fused conv-tower
    kernel chain (ops/conv_tower.py): one HBM pass per layer instead of
    XLA's three (conv, BN reduce, elementwise chain). A strided input conv
    (audio's (1, 80)) stays in XLA — good MXU shape — and feeds the chain
    externally. Param names are identical in both paths.
    """

    out_channels: int
    conv_lens: Sequence[Sequence[int]]
    num_inter_layers: int
    in_stride: Sequence[int] = (1, 1)
    dropout_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        half = self.out_channels // 2
        stride = tuple(self.in_stride) if not isinstance(self.in_stride, int) else (1, self.in_stride)
        padding = "SAME" if max(stride) == 1 else "VALID"

        fused = self._fused_geometry(x, half, stride)
        if self.use_pallas and train and fused is not None:
            x = self._fused_tower(x, half, stride, *fused)
        else:
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

    def _fused_geometry(self, x, half, stride):
        """(s_out, strided) when the fused tower supports this shape, else
        None — decided BEFORE any param declaration so both paths stay
        checkpoint-identical."""
        from focal_tpu.ops.conv_tower import tower_fits

        if self.conv_lens[0][0] != 1 or self.conv_lens[1][0] != 1:
            return None  # tall kernels fuse the interval axis; XLA path
        b, i, s, _ = x.shape
        strided = max(stride) > 1
        s_out = (s - self.conv_lens[0][1]) // stride[1] + 1 if strided else s
        kw_max = self.conv_lens[1][1] if strided else max(
            self.conv_lens[0][1], self.conv_lens[1][1])
        if not tower_fits(b * i, s_out, half, self.dtype, kw_max=kw_max):
            return None
        return s_out, strided

    def _fused_tower(self, x, half, stride, s_out, strided):
        from focal_tpu.ops.conv_tower import fused_conv_tower

        b, i, s, cin = x.shape
        L = 1 + self.num_inter_layers
        kws = [self.conv_lens[0][1]] + [self.conv_lens[1][1]] * self.num_inter_layers
        cins = [cin] + [half] * self.num_inter_layers
        decls = [
            _ConvLayerDecl(1, kws[k], cins[k], half, name=f"ConvLayer2D_{k}")()
            for k in range(L)
        ]

        xd = x.astype(self.dtype)
        if strided:
            k0, b0 = decls[0][0], decls[0][1]
            c0 = jax.lax.conv_general_dilated(
                xd, k0.astype(self.dtype), stride, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b0.astype(self.dtype)[None, None, None, :]
            x0 = c0.reshape(b * i, s_out, half)
        else:
            x0 = xd.reshape(b * i, s_out, cin)

        cfgs, ws, bs, scales, biases, masks = [], [], [], [], [], []
        rate = float(self.dropout_ratio)
        for k in range(L):
            kk, bb_, sc, bi_, _, _ = decls[k]
            cfgs.append((kws[k], cins[k], half, k > 0))
            if k == 0 and strided:
                ws.append(jnp.zeros((1, 1), self.dtype))  # external c0
            else:
                ws.append(kk.reshape(kws[k] * cins[k], half).astype(self.dtype))
            bs.append(bb_)
            scales.append(sc)
            biases.append(bi_)
            if rate > 0.0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - rate, (b, half))
                m = keep.astype(jnp.float32) / (1.0 - rate)
            else:
                m = jnp.ones((b, half), jnp.float32)
            masks.append(jnp.repeat(m, i, axis=0))

        a, mus, vars_ = fused_conv_tower(
            x0, tuple(cfgs), ws, bs, scales, biases, masks,
            external_c0=strided)

        if not self.is_initializing():
            # nn.BatchNorm's running-average update (momentum 0.9)
            for k in range(L):
                mean_v, var_v = decls[k][4], decls[k][5]
                mean_v.value = 0.9 * mean_v.value + 0.1 * mus[k]
                var_v.value = 0.9 * var_v.value + 0.1 * vars_[k]
        return a.reshape(b, i, s_out, half)


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
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
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
