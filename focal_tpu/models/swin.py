"""Shifted-window transformer blocks.

Functional rebuild of the reference's Swin stack
(reference: src/models/SwinModules.py:18-565) with every geometry decision —
padded sizes, window shrink, shift sizes, SW-MSA attention masks, relative
position indices — resolved to static constants at module-build time, so the
compiled program is pure reshapes, rolls and batched matmuls on the MXU.

Window-shrink parity (SwinModules.py:222-236): when a stage's resolution is
not larger than the window along an axis, the window collapses to that
resolution and the shift on that axis becomes 0; masking only happens when
BOTH shift components are positive (SwinModules.py:262-291,305).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, wh, ww):
    """[B, H, W, C] -> [B*nW, wh*ww, C] (reference: SwinModules.py:37-52)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(windows, wh, ww, H, W):
    """[B*nW, wh*ww, C] -> [B, H, W, C] (reference: SwinModules.py:55-70)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // wh // ww)
    x = windows.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index(wh, ww):
    """Static [wh*ww, wh*ww] index into the bias table
    (reference: SwinModules.py:100-111)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))  # [2, wh, ww]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [N, N]


def shifted_window_mask(H, W, wh, ww, sh, sw):
    """Static additive mask [nW, N, N] for SW-MSA
    (reference: SwinModules.py:262-291)."""
    # pure numpy: this runs at trace time and must stay a compile-time constant
    img_mask = np.zeros((H, W), np.float32)
    h_slices = (slice(0, -wh), slice(-wh, -sh), slice(-sh, None))
    w_slices = (slice(0, -ww), slice(-ww, -sw), slice(-sw, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[h, w] = cnt
            cnt += 1
    mask_windows = (
        img_mask.reshape(H // wh, wh, W // ww, ww)
        .transpose(0, 2, 1, 3)
        .reshape(-1, wh * ww)
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def _remat_drop(module, x, rate, train):
    """Dropout whose backward regenerates the mask from the key instead of
    storing it as a residual (focal_tpu.ops.dropout) — on big activations the
    stored masks are real HBM traffic. Identity in eval / rate==0."""
    if not train or rate == 0.0:
        return x
    from focal_tpu.ops.dropout import remat_dropout

    return remat_dropout(x, module.make_rng("dropout"), float(rate))


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference: SwinModules.py:73-152).

    use_pallas enables the fused VMEM kernels (forward AND backward). On a
    >1-device mesh the kernels are wrapped in shard_map over the ``data``
    axis (pass ``pallas_mesh``); off-TPU they run in interpreter mode, which
    is slower than the XLA path, so the builder leaves use_pallas off there.
    """

    dim: int
    window_size: Sequence[int]  # (wh, ww)
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_block: bool = False
    pallas_mesh: Any = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        B_, N, C = x.shape
        wh, ww = self.window_size
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        # tiny windows (N<=16): the MXU can't tile 9x9x16 batched matmuls;
        # attention runs either as a fused pallas VMEM kernel or, when
        # in-kernel limits apply, as a VPU broadcast-multiply-reduce
        # (measured on v5e: 4.0 ms vs 15.8 ms for 32768 9-token windows)
        small_window = N <= 16

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        rel_index = relative_position_index(wh, ww).reshape(-1)
        bias = bias_table[rel_index].reshape(N, N, self.num_heads).transpose(2, 0, 1)

        # fused pallas path: one VMEM pass each for forward (scores + softmax
        # + weighted sum) and backward (dq/dk/dv/dbias). Training dropout uses
        # the in-kernel TPU PRNG; the backward regenerates the mask from the
        # same seed. The bias is passed as a compact lane-periodic pattern
        # [H, N, N, 128] (needs nW | 128) instead of a [B_, H, N, N] broadcast.
        dropout_active = train and self.attn_drop > 0.0
        mesh = self.pallas_mesh
        if mesh is not None and "model" in mesh.shape:
            tp_ways = mesh.shape["model"]
            dp_ways = mesh.shape.get("data", 1)
        else:
            tp_ways = 1
            dp_ways = mesh.size if mesh is not None else 1
        n_shards = dp_ways
        from focal_tpu.ops.pallas_kernels import _on_tpu

        # Gate conditions, in order: tiny-window kernel only; lane-periodic
        # bias needs nW | 128; the window batch must shard evenly over the
        # DATA axis AND each shard's window count must stay a multiple of nW
        # (the shift mask is applied by lane position — splitting a sample's
        # windows across shards would pair masks with the wrong windows); the
        # dropout kernels use the hardware PRNG, which has no interpreter
        # fallback.
        fused_ok = (
            small_window
            and self.use_pallas
            and (mask is None or 128 % mask.shape[0] == 0)
            and B_ % max(dp_ways, 1) == 0
            and (mask is None or (B_ // max(dp_ways, 1)) % mask.shape[0] == 0)
            and (not dropout_active or _on_tpu())
        )

        from focal_tpu.ops.pallas_kernels import wblock_fits_any, wblock_perhead_fits

        # tensor parallelism: the PER-HEAD whole-block kernel shard_maps over
        # (data, model) with whole heads per model shard — the same head unit
        # parallel/tp.py shards the qkv/proj/bias params by, so each shard
        # consumes its resident weights with zero resharding. Geometries the
        # per-head grid can't hold (or head counts that don't divide) fall
        # back to the XLA attention path under GSPMD.
        use_tp_block = (
            fused_ok
            and tp_ways > 1
            and self.use_pallas_block
            and self.num_heads % tp_ways == 0
            and wblock_perhead_fits(N, C, self.num_heads)
        )
        use_fused = fused_ok and tp_ways == 1

        if use_tp_block:
            from focal_tpu.ops.pallas_kernels import (
                expand_bias_lanes,
                sharded_window_block_tp,
            )

            wqkv_r, bqkv_r = _DenseParams(
                C, 3 * C, use_bias=self.qkv_bias, name="qkv",
                features=(3, self.num_heads, head_dim), raw=True,
            )()
            wproj, bproj = _DenseParams(C, C, name="proj")()
            # fold the q scaling into the weights on the PART axis (the raw
            # [C, 3, H, hd] layout keeps head sharding intact)
            scale_part = jnp.asarray([scale, 1.0, 1.0], jnp.float32)
            wqkv_s = (wqkv_r * scale_part[None, :, None, None]).astype(self.dtype)
            bqkv_s = (bqkv_r * scale_part[:, None, None]).astype(jnp.float32)
            bias_l = expand_bias_lanes(bias.astype(jnp.float32), mask)
            xb = x.astype(self.dtype)
            seed = None
            if dropout_active:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
            out = sharded_window_block_tp(
                mesh, xb, wqkv_s, bqkv_s, wproj.astype(self.dtype),
                bproj.astype(jnp.float32), bias_l, seed=seed,
                rate=float(self.attn_drop),
            )
            return _remat_drop(self, out.astype(self.dtype), self.proj_drop, train)

        if use_fused and self.use_pallas_block and wblock_fits_any(N, C, self.num_heads):
            # whole-block kernel: qkv projection + attention + output
            # projection in one VMEM pass per tile. The separate Dense layers
            # would run on the window layout, and their BACKWARD materialises
            # the [B_, N, 3C] gradient plus its conversion back to image
            # layout — profiled at ~13 ms of an 84 ms SW step (BASELINE.md).
            # Params keep nn.Dense's exact names/shapes (checkpoint-stable).
            # Wide stages where the monolithic working set exceeds Mosaic's
            # scoped-VMEM stack (C>=512) dispatch to the per-head-gridded
            # variant inside the impl; only geometries neither variant fits
            # (wblock_fits_any False) fall back to the attention-only kernel.
            from focal_tpu.ops.pallas_kernels import (
                expand_bias_lanes,
                fused_window_block,
                fused_window_block_dropout,
                sharded_window_block,
            )

            wqkv, bqkv = _DenseParams(
                C, 3 * C, use_bias=self.qkv_bias, name="qkv",
                features=(3, self.num_heads, head_dim),
            )()
            wproj, bproj = _DenseParams(C, C, name="proj")()
            # fold the q scaling into the weights: q = (Wq*s)^T x + bq*s
            scale_vec = jnp.concatenate(
                [jnp.full((C,), scale, jnp.float32), jnp.ones((2 * C,), jnp.float32)]
            )
            wqkv_s = (wqkv * scale_vec[None, :]).astype(self.dtype)
            bqkv_s = (bqkv * scale_vec).astype(jnp.float32)
            bias_l = expand_bias_lanes(bias.astype(jnp.float32), mask)
            xb = x.astype(self.dtype)
            seed = None
            if dropout_active:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            if n_shards > 1:
                out = sharded_window_block(
                    mesh, xb, wqkv_s, bqkv_s, wproj.astype(self.dtype),
                    bproj.astype(jnp.float32), bias_l, seed=seed, rate=float(self.attn_drop)
                )
            elif seed is not None:
                out = fused_window_block_dropout(
                    xb, wqkv_s, bqkv_s, wproj.astype(self.dtype),
                    bproj.astype(jnp.float32), bias_l, seed, float(self.attn_drop)
                )
            else:
                out = fused_window_block(
                    xb, wqkv_s, bqkv_s, wproj.astype(self.dtype),
                    bproj.astype(jnp.float32), bias_l
                )
            return _remat_drop(self, out.astype(self.dtype), self.proj_drop, train)

        # head-aligned qkv layout [C, 3, H, hd]: ravels losslessly to the
        # fused [C, 3C] (column order part|head|dim, the same the reference's
        # qkv Linear uses), and the explicit head axis lets tensor parallelism
        # shard attention by whole heads with zero resharding (parallel/tp.py)
        qkv = nn.DenseGeneral(
            features=(3, self.num_heads, head_dim),
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            name="qkv",
            kernel_init=_flat_lecun_init,
        )(x)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # [3, B_, H, N, hd]
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        if use_fused:
            from focal_tpu.ops.pallas_kernels import (
                expand_bias_lanes,
                fused_window_attention,
                fused_window_attention_dropout,
                sharded_window_attention,
            )

            bias_l = expand_bias_lanes(bias.astype(jnp.float32), mask)
            seed = None
            if dropout_active:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            if n_shards > 1:
                out = sharded_window_attention(
                    mesh, q, k, v, bias_l, seed=seed, rate=float(self.attn_drop)
                )
            elif seed is not None:
                out = fused_window_attention_dropout(q, k, v, bias_l, seed, float(self.attn_drop))
            else:
                out = fused_window_attention(q, k, v, bias_l)
            out = out.transpose(0, 2, 1, 3).reshape(B_, N, C).astype(self.dtype)
            out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            return _remat_drop(self, out, self.proj_drop, train)

        if small_window:
            attn = (q[:, :, :, None, :] * k[:, :, None, :, :]).sum(-1).astype(jnp.float32)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = attn + bias[None].astype(jnp.float32)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(B_, self.num_heads, N, N)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = _remat_drop(self, attn, self.attn_drop, train)
        if small_window:
            out = (attn[..., None] * v[:, :, None, :, :]).sum(-2)
        else:
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return _remat_drop(self, out, self.proj_drop, train)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath used at SwinModules.py:257)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0:
            return x
        if not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def _flat_lecun_init(key, shape, dtype=jnp.float32):
    """lecun_normal drawn on the FLAT [in, out] dense shape then reshaped:
    multi-dim feature kernels (e.g. the head-aligned qkv [C, 3, H, hd]) get
    bit-identical values to the fused nn.Dense layout they ravel to."""
    import numpy as _np

    flat = (shape[0], int(_np.prod(shape[1:])))
    return nn.initializers.lecun_normal()(key, flat, dtype).reshape(shape)


class _DenseParams(nn.Module):
    """Kernel/bias with nn.Dense's names, inits and tree position, for paths
    that consume the weights directly (the fused pallas MLP and the
    whole-block attention kernel). use_bias=False declares no bias param
    (matching nn.Dense) and returns zeros. `features` declares a multi-dim
    feature shape (DenseGeneral-style, must ravel to out_dim) — stored
    multi-dim for sharding rules, returned flattened to [in, out]."""

    in_dim: int
    out_dim: int
    use_bias: bool = True
    features: Any = None
    # raw=True returns the stored multi-dim layout unflattened — the tensor-
    # parallel kernel path consumes [C, 3, H, hd] directly; flattening a
    # head-sharded param to [C, 3C] interleaves heads across the fused column
    # order and would force GSPMD to all-gather it
    raw: bool = False

    @nn.compact
    def __call__(self):
        if self.features is not None:
            kshape = (self.in_dim,) + tuple(self.features)
            bshape = tuple(self.features)
            init = _flat_lecun_init
        else:
            kshape = (self.in_dim, self.out_dim)
            bshape = (self.out_dim,)
            init = nn.initializers.lecun_normal()
        k = self.param("kernel", init, kshape)
        if not self.raw:
            k = k.reshape(self.in_dim, self.out_dim)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), bshape)
            if not self.raw:
                b = b.reshape(self.out_dim)
        else:
            b = jnp.zeros(bshape if self.raw else (self.out_dim,), jnp.float32)
        return k, b


class Mlp(nn.Module):
    """fc -> GELU -> drop -> fc -> drop (reference: SwinModules.py:18-34).

    With use_pallas the whole block runs as one fused kernel per row tile
    (focal_tpu.ops.pallas_kernels.fused_mlp*): the [rows, 4C] hidden never
    reaches HBM — XLA's lowering writes it twice (forward + backward
    residual), ~300 MB/step at MOD stage-0 sizes. Dropout masks come from
    the hardware PRNG and are regenerated in the backward.
    """

    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    pallas_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.use_pallas:
            from focal_tpu.ops.pallas_kernels import (
                fused_mlp,
                fused_mlp_dropout,
                mlp_fits,
                sharded_fused_mlp,
            )

            C = x.shape[-1]
            w1, b1 = _DenseParams(C, self.hidden, name="Dense_0")()
            w2, b2 = _DenseParams(self.hidden, self.out, name="Dense_1")()
            lead = x.shape[:-1]
            rows = int(np.prod(lead))
            mesh = self.pallas_mesh
            n_shards = mesh.size if mesh is not None else 1
            from focal_tpu.ops.pallas_kernels import _on_tpu

            # mlp_fits: wide layers overflow Mosaic's scoped-VMEM stack (the
            # kernel holds w1/w2 + grad accumulators whole) -> plain math.
            # Dropout needs the hardware PRNG: off-TPU (interpret mode) the
            # dropout variants cannot run, so fall through to plain math —
            # same gate WindowAttention applies above.
            dropout_active = train and self.drop > 0.0
            if (
                rows % max(n_shards, 1) == 0
                and mlp_fits(C, self.hidden)
                and (not dropout_active or _on_tpu())
            ):
                x2 = x.reshape(rows, C).astype(self.dtype)
                seed = None
                if dropout_active:
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max,
                        dtype=jnp.int32,
                    )
                if n_shards > 1:
                    y = sharded_fused_mlp(mesh, x2, w1, b1, w2, b2, seed=seed,
                                          rate=float(self.drop))
                elif seed is not None:
                    y = fused_mlp_dropout(x2, w1, b1, w2, b2, seed, float(self.drop))
                else:
                    y = fused_mlp(x2, w1, b1, w2, b2)
                return y.reshape(lead + (self.out,)).astype(self.dtype)
            # ragged shard fallback: same params, plain math
            h = jnp.dot(x.astype(self.dtype), w1.astype(self.dtype)) + b1.astype(self.dtype)
            h = nn.gelu(h, approximate=False)
            h = _remat_drop(self, h, self.drop, train)
            y = jnp.dot(h, w2.astype(self.dtype)) + b2.astype(self.dtype)
            return _remat_drop(self, y, self.drop, train)

        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact erf
        x = _remat_drop(self, x, self.drop, train)
        x = nn.Dense(self.out, dtype=self.dtype)(x)
        return _remat_drop(self, x, self.drop, train)


class SwinBlock(nn.Module):
    """One (S)W-MSA + MLP block (reference: SwinModules.py:171-343)."""

    dim: int
    input_resolution: Sequence[int]  # (H, W)
    num_heads: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_block: bool = False
    use_pallas_mlp: bool = False
    pallas_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        H, W = self.input_resolution
        B, L, C = x.shape

        # static window-shrink rule (SwinModules.py:222-236)
        wh, ww = self.window_size
        sh, sw = self.shift_size
        if H <= wh:
            sh, wh = 0, H
        if W <= ww:
            sw, ww = 0, W
        shifted = min(sh, sw) > 0
        mask = shifted_window_mask(H, W, wh, ww, sh, sw) if shifted else None

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)
        if shifted:
            x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
        windows = window_partition(x, wh, ww)
        attn_out = WindowAttention(
            self.dim, (wh, ww), self.num_heads, self.qkv_bias,
            self.attn_drop, self.drop, dtype=self.dtype,
            use_pallas=self.use_pallas, use_pallas_block=self.use_pallas_block,
            pallas_mesh=self.pallas_mesh, name="attn",
        )(windows, mask, train)
        x = window_reverse(attn_out, wh, ww, H, W)
        if shifted:
            x = jnp.roll(x, shift=(sh, sw), axis=(1, 2))
        x = x.reshape(B, L, C)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        # the fused pallas MLP is OPT-IN (-pallas_mlp): at reference dims it
        # measured 6% slower than XLA's lowering (2,838 vs 3,034 windows/s) —
        # C=64..256 MLPs are MXU-utilization-bound (K=64 contractions), not
        # HBM-bound, so saving the hidden's round trip doesn't pay there; it
        # exists for wider models (MOD_WIDE) where the [rows, 4C] hidden's
        # two HBM round trips dominate.
        y = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype,
            use_pallas=self.use_pallas_mlp, pallas_mesh=self.pallas_mesh, name="mlp",
        )(y, train)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class PatchMerging(nn.Module):
    """2x2 patch concat + LayerNorm + linear reduce
    (reference: SwinModules.py:366-402)."""

    input_resolution: Sequence[int]
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class BasicLayer(nn.Module):
    """Stage: depth blocks with alternating shift + optional merging
    (reference: SwinModules.py:414-504)."""

    dim: int
    input_resolution: Sequence[int]
    depth: int
    num_heads: int
    window_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_block: bool = False
    use_pallas_mlp: bool = False
    pallas_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.depth):
            shift = (
                [0, 0]
                if i % 2 == 0
                else [self.window_size[0] // 2, self.window_size[1] // 2]
            )
            dp = self.drop_path[i] if i < len(self.drop_path) else self.drop_path[-1]
            x = SwinBlock(
                dim=self.dim,
                input_resolution=self.input_resolution,
                num_heads=self.num_heads,
                window_size=list(self.window_size),
                shift_size=shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=dp,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                use_pallas_block=self.use_pallas_block,
                use_pallas_mlp=self.use_pallas_mlp,
                pallas_mesh=self.pallas_mesh,
                name=f"block{i}",
            )(x, train)
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dim, dtype=self.dtype, name="downsample")(x)
        return x


class PatchEmbed(nn.Module):
    """Conv patchify + optional LayerNorm (reference: SwinModules.py:518-558).
    Named 'patch_embed*' so the pretrain freeze rule finds it
    (reference: weight_utils.py:85-94)."""

    patch_size: Sequence[int]
    embed_dim: int
    norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] NHWC
        ph, pw = self.patch_size
        x = nn.Conv(
            self.embed_dim, kernel_size=(ph, pw), strides=(ph, pw), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        if self.norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x
