"""Pallas TPU kernels.

fused_window_attention: the Swin towers spend most of their time on
window attention over tiny (<=16 token) windows. XLA's batched-matmul
lowering cannot tile 9x9x16 contractions onto the MXU, and even the
broadcast-multiply-reduce formulation runs as several separate fusions with
HBM round-trips between scores, softmax and the weighted sum. This kernel
computes the whole attention in one VMEM pass using a batch-in-lanes layout:
operands are transposed to [heads, tokens, dim, batch] so every elementwise
op vectorises over the 128-lane axis and no intermediate leaves VMEM.

The backward pass is the standard attention VJP expressed in the same
VPU-friendly broadcast form, run through XLA (a fused backward kernel is a
further optimisation). Falls back to interpreter mode off-TPU so tests run
on CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 512  # windows per kernel invocation (multiple of 128)


def _scores_softmax(q, k, bias):
    """scores[n, m, b] = sum_d q[n,d,b] k[m,d,b]; softmax over m.
    Unrolled over the (tiny, static) n axis so temporaries stay [N, D, TB]
    instead of [N, N, D, TB] — the latter blows the VMEM stack at D=64."""
    N = q.shape[0]
    rows = []
    for n in range(N):
        s_n = jnp.sum(q[n][None, :, :] * k, axis=1) + bias[n]  # [N(m), TB]
        s_n = s_n - jnp.max(s_n, axis=0, keepdims=True)
        e = jnp.exp(s_n)
        rows.append(e / jnp.sum(e, axis=0, keepdims=True))
    return jnp.stack(rows)  # [N, N, TB]


def _weighted_sum(attn, v):
    """out[n, d, b] = sum_m attn[n,m,b] v[m,d,b], unrolled over n."""
    N = attn.shape[0]
    return jnp.stack([jnp.sum(attn[n][:, None, :] * v, axis=0) for n in range(N)])


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One (head, batch-tile): q/k/v [1, N, D, TB], bias [1, N, N, TB]."""
    q = q_ref[0].astype(jnp.float32)  # [N, D, TB]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    attn = _scores_softmax(q, k, bias_ref[0])
    out_ref[0] = _weighted_sum(attn, v).astype(out_ref.dtype)


def _pallas_forward(qt, kt, vt, bias_t, tile):
    """qt/kt/vt: [H, N, D, B], bias_t: [H, N, N, B] -> [H, N, D, B]."""
    H, N, D, B = qt.shape
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid = (H, B // tile)

    def idx(h, b):
        return (h, 0, 0, b)

    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((H, N, D, B), qt.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N, tile), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qt, kt, vt, bias_t)


def _xla_attention(q, k, v, bias_b):
    """Reference math in broadcast form: q/k/v [B, H, N, D], bias_b [B, H, N, N]."""
    scores = (q[:, :, :, None, :] * k[:, :, None, :, :]).sum(-1).astype(jnp.float32) + bias_b
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return (attn[..., None] * v[:, :, None, :, :]).sum(-2)


def _prepare(q, k, v, bias_b):
    """Pad the window-batch to the lane tile and move it to the lane axis:
    [B, H, N, D] -> [H, N, D, Bp]. Returns (qt, kt, vt, bias_t, B, tile)."""
    B = q.shape[0]
    tile = LANE_TILE if B >= LANE_TILE else max(128, ((B + 127) // 128) * 128)
    pad = (-B) % tile
    if pad:
        q, k, v = (jnp.pad(a, ((0, pad), (0, 0), (0, 0), (0, 0))) for a in (q, k, v))
        bias_b = jnp.pad(bias_b, ((0, pad), (0, 0), (0, 0), (0, 0)))
    qt, kt, vt = (a.transpose(1, 2, 3, 0) for a in (q, k, v))
    return qt, kt, vt, bias_b.transpose(1, 2, 3, 0), B, tile


def _impl(q, k, v, bias_b):
    qt, kt, vt, bias_t, B, tile = _prepare(q, k, v, bias_b)
    out_t = _pallas_forward(qt, kt, vt, bias_t, tile)
    return out_t.transpose(3, 0, 1, 2)[:B]


@jax.custom_vjp
def fused_window_attention(q, k, v, bias_b):
    """softmax(q kT + bias) v over tiny windows.

    q, k, v: [B, H, N, D] (any float dtype), bias_b: [B, H, N, N] float32
    (relative-position bias + any shift mask, already broadcast per window).
    Returns [B, H, N, D] in q's dtype. No attention dropout — callers fall
    back to the XLA path when attn_drop is active in train mode.
    """
    return _impl(q, k, v, bias_b)


def _fwd(q, k, v, bias_b):
    return _impl(q, k, v, bias_b), (q, k, v, bias_b)


def _bwd(res, g):
    q, k, v, bias_b = res
    # recompute attn (cheap, keeps residual memory small)
    scores = (q[:, :, :, None, :] * k[:, :, None, :, :]).sum(-1).astype(jnp.float32) + bias_b
    attn = jax.nn.softmax(scores, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    d_attn = (gf[:, :, :, None, :] * vf[:, :, None, :, :]).sum(-1)  # [B,H,N,M]
    ds = attn * (d_attn - (d_attn * attn).sum(-1, keepdims=True))  # softmax VJP
    dv = (attn[..., None] * gf[:, :, :, None, :]).sum(2)  # [B,H,M,D]
    dq = (ds[..., None] * k.astype(jnp.float32)[:, :, None, :, :]).sum(-2)
    dk = (ds.swapaxes(-1, -2)[..., None] * q.astype(jnp.float32)[:, :, None, :, :]).sum(-2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), ds


fused_window_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# dropout-capable variant (training): attention dropout runs in-kernel via
# the TPU PRNG; the dropped attention matrix is saved as a residual so the
# XLA backward stays consistent with the kernel's random mask.
# ---------------------------------------------------------------------------


def _attn_dropout_kernel(rate, seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, attn_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    attn = _scores_softmax(q, k, bias_ref[0])

    # unique stream per (head, batch-tile)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 65537 + pl.program_id(1))
    bits = pltpu.prng_random_bits(attn.shape)
    threshold = jnp.uint32(rate * 4294967296.0)
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    attn = jnp.where(keep, attn / (1.0 - rate), 0.0)

    out_ref[0] = _weighted_sum(attn, v).astype(out_ref.dtype)
    attn_ref[0] = attn


def _pallas_forward_dropout(qt, kt, vt, bias_t, seed, rate, tile):
    H, N, D, B = qt.shape
    grid = (H, B // tile)

    def idx(h, b):
        return (h, 0, 0, b)

    def idx_seed(h, b):
        return (0,)

    out, attn = pl.pallas_call(
        functools.partial(_attn_dropout_kernel, rate),
        out_shape=(
            jax.ShapeDtypeStruct((H, N, D, B), qt.dtype),
            jax.ShapeDtypeStruct((H, N, N, B), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), idx_seed, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N, tile), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, D, tile), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, N, tile), idx, memory_space=pltpu.VMEM),
        ),
    )(seed, qt, kt, vt, bias_t)
    return out, attn


def _impl_dropout(q, k, v, bias_b, seed, rate):
    qt, kt, vt, bias_t, B, tile = _prepare(q, k, v, bias_b)
    out_t, attn_t = _pallas_forward_dropout(qt, kt, vt, bias_t, seed.reshape(1), rate, tile)
    return out_t.transpose(3, 0, 1, 2)[:B], attn_t.transpose(3, 0, 1, 2)[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_window_attention_dropout(q, k, v, bias_b, seed, rate):
    """Fused window attention with in-kernel attention dropout.

    seed: int32 scalar (vary per step); rate: static dropout rate in (0, 1).
    TPU-only (uses the hardware PRNG; no interpreter fallback) — callers gate
    on the backend.
    """
    out, _ = _impl_dropout(q, k, v, bias_b, seed, rate)
    return out


def _fwd_dropout(q, k, v, bias_b, seed, rate):
    out, attn_dropped = _impl_dropout(q, k, v, bias_b, seed, rate)
    return out, (q, k, v, bias_b, attn_dropped)


def _bwd_dropout(rate, res, g):
    q, k, v, bias_b, a_drop = res
    scores = (q[:, :, :, None, :] * k[:, :, None, :, :]).sum(-1).astype(jnp.float32) + bias_b
    a = jax.nn.softmax(scores, axis=-1)  # pre-dropout attention
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = (a_drop[..., None] * gf[:, :, :, None, :]).sum(2)  # [B,H,M,D]
    d_adrop = (gf[:, :, :, None, :] * vf[:, :, None, :, :]).sum(-1)  # [B,H,N,M]
    # a_drop = a * mask/keep  =>  da = d_adrop * a_drop / a  (0 where dropped)
    da = d_adrop * a_drop / jnp.maximum(a, 1e-20)
    ds = a * (da - (da * a).sum(-1, keepdims=True))
    dq = (ds[..., None] * k.astype(jnp.float32)[:, :, None, :, :]).sum(-2)
    dk = (ds.swapaxes(-1, -2)[..., None] * q.astype(jnp.float32)[:, :, None, :, :]).sum(-2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), ds, None


fused_window_attention_dropout.defvjp(_fwd_dropout, _bwd_dropout)
