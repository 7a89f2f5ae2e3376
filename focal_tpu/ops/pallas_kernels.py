"""Pallas TPU kernels: fused window attention (+ an opt-in fused MLP).

The Swin towers spend most of their time on attention over tiny (<=16 token)
windows. XLA's batched-matmul lowering cannot tile 9x9x16 contractions onto
the MXU, and the broadcast-multiply-reduce formulation runs as several
separate fusions with HBM round-trips between scores, softmax and the
weighted sum. These kernels compute the whole attention — forward AND
backward — in one VMEM pass each, using a batch-in-lanes layout: operands are
transposed to [heads, tokens, dim, window-batch] so every elementwise op
vectorises over the 128-lane axis and no intermediate touches HBM.

Bias layout: window attention adds a relative-position bias that is shared by
all windows plus (for shifted blocks) a per-window mask. Both repeat with
period nW (windows per image) along the window-batch axis. Instead of
broadcasting a [B, H, N, N] bias (tens of MB of HBM traffic per layer), the
kernels take a compact ``bias_l`` of shape [H, N, N, 128] holding the pattern
for one 128-lane register (valid whenever nW divides 128) and tile it across
lanes inside VMEM.

The backward kernels compute dq/dk/dv in the same layout and reduce the bias
gradient to [H, N, N, 128] in-kernel (accumulated across window-batch tiles by
revisiting the output block). The dropout variant regenerates its keep-mask in
the backward by reseeding the hardware PRNG with the forward's seed — no
attention residual is ever materialised.

Multi-chip: ``sharded_window_attention`` wraps the kernels in ``shard_map``
over the data mesh axis so the fused path survives pjit over >1 device
(Mosaic kernels cannot be auto-partitioned).

Off-TPU the kernels run in interpreter mode so CPU tests exercise the same
code path (except the dropout variants, which need the hardware PRNG).

Reference for the math these kernels must reproduce:
/root/reference/src/models/SwinModules.py:121-152 (softmax(q k^T * scale +
rel_pos_bias + shift_mask) v; the *scale is applied by the caller).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

LANE = 128
MAX_TILE = 512  # windows per kernel invocation (multiple of 128)
_VMEM_BUDGET = 6 * 1024 * 1024  # per-block working-set target, bytes


def _on_tpu():
    return jax.default_backend() in ("tpu", "axon")


def _pick_tile(N, D, B, n_nd_bufs, n_nn_bufs):
    """Largest lane tile (multiple of 128, <= MAX_TILE) whose f32 working set
    fits the VMEM budget."""
    tile = MAX_TILE
    while tile > LANE and (n_nd_bufs * N * D + n_nn_bufs * N * N) * tile * 4 > _VMEM_BUDGET:
        tile //= 2
    if B < tile:
        tile = max(LANE, ((B + LANE - 1) // LANE) * LANE)
    return tile


def _dropout_tile(N, D, B):
    """Tile shared by the dropout forward AND backward. The keep-mask is
    regenerated in the backward from (seed, program ids, tile-shaped PRNG
    draw), so both passes must use an identical tile or the backward applies
    a different mask than the forward did (silently wrong gradients — e.g.
    at D=64 the fwd-sized pick is 512 but the bwd-sized pick is 256). Sized
    for the backward's larger working set (7 [N,D,TB] + 6 [N,N,TB] buffers)."""
    return _pick_tile(N, D, B, n_nd_bufs=7, n_nn_bufs=6)


def _expand_bias(bias, tile):
    """[N, N, 128] -> [N, N, tile] by repeating whole 128-lane registers."""
    reps = tile // LANE
    if reps == 1:
        return bias
    return jnp.concatenate([bias] * reps, axis=-1)


def _scores_softmax(q, k, bias):
    """scores[n, m, b] = sum_d q[n,d,b] k[m,d,b] + bias[n,m,b]; softmax over m.
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


def _dropout_mask(seed_ref, shape, rate):
    """Deterministic per-(head, batch-tile) keep mask from the hardware PRNG.
    Called with identical seeds/program ids in forward and backward so the
    backward regenerates the forward's mask instead of loading a residual."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 65537 + pl.program_id(1))
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(rate * 4294967296.0)
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    """One (head, batch-tile): q/k/v [1, N, D, TB], bias [1, N, N, 128]."""
    q = q_ref[0].astype(jnp.float32)  # [N, D, TB]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = _expand_bias(bias_ref[0], q.shape[-1])
    attn = _scores_softmax(q, k, bias)
    out_ref[0] = _weighted_sum(attn, v).astype(out_ref.dtype)


def _attn_fwd_dropout_kernel(rate, seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = _expand_bias(bias_ref[0], q.shape[-1])
    attn = _scores_softmax(q, k, bias)
    keep = _dropout_mask(seed_ref, attn.shape, rate)
    attn = jnp.where(keep, attn / (1.0 - rate), 0.0)
    out_ref[0] = _weighted_sum(attn, v).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernels: dq/dk/dv in the batch-in-lanes layout, dbias reduced
# in-kernel to one [N, N, 128] register pattern per head
# ---------------------------------------------------------------------------


def _bwd_math(q, k, v, g, bias, keep, inv_keep):
    """Shared VJP math. q/k/v/g: [N, D, TB] f32; bias: [N, N, TB];
    keep: bool [N, N, TB] or None. Returns dq, dk, dv [N, D, TB] and
    ds [N, N, TB] (the score gradient == per-lane bias gradient)."""
    N = q.shape[0]
    attn = _scores_softmax(q, k, bias)  # pre-dropout attention
    # d_attn[n, m, b] = sum_d g[n, d, b] v[m, d, b]
    d_attn = jnp.stack([jnp.sum(g[n][None, :, :] * v, axis=1) for n in range(N)])
    if keep is None:
        a_v = attn  # attention actually multiplied with v in the forward
        da = d_attn
    else:
        a_v = jnp.where(keep, attn * inv_keep, 0.0)
        da = jnp.where(keep, d_attn * inv_keep, 0.0)
    # softmax VJP on the pre-dropout attention
    ds = attn * (da - jnp.sum(da * attn, axis=1, keepdims=True))  # [N, N, TB]
    dv = jnp.stack([jnp.sum(a_v[:, m][:, None, :] * g, axis=0) for m in range(N)])
    dq = jnp.stack([jnp.sum(ds[n][:, None, :] * k, axis=0) for n in range(N)])
    dk = jnp.stack([jnp.sum(ds[:, m][:, None, :] * q, axis=0) for m in range(N)])
    return dq, dk, dv, ds


def _store_grads(ds, dq, dk, dv, dq_ref, dk_ref, dv_ref, dbias_ref):
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    # fold the tile's lanes onto one 128-lane register: lane l of the bias
    # input feeds tile positions p with p % 128 == l (same congruence the
    # forward's _expand_bias uses), so dbias[l] = sum over those positions
    tb = ds.shape[-1]
    db = ds[:, :, 0:LANE]
    for r in range(1, tb // LANE):
        db = db + ds[:, :, r * LANE : (r + 1) * LANE]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dbias_ref[0] = db

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        dbias_ref[0] = dbias_ref[0] + db


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, dbias_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    bias = _expand_bias(bias_ref[0], q.shape[-1])
    dq, dk, dv, ds = _bwd_math(q, k, v, g, bias, None, None)
    _store_grads(ds, dq, dk, dv, dq_ref, dk_ref, dv_ref, dbias_ref)


def _attn_bwd_dropout_kernel(rate, seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                             dq_ref, dk_ref, dv_ref, dbias_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    bias = _expand_bias(bias_ref[0], q.shape[-1])
    keep = _dropout_mask(seed_ref, (q.shape[0], q.shape[0], q.shape[-1]), rate)
    dq, dk, dv, ds = _bwd_math(q, k, v, g, bias, keep, 1.0 / (1.0 - rate))
    _store_grads(ds, dq, dk, dv, dq_ref, dk_ref, dv_ref, dbias_ref)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _nd_spec(N, D, tile):
    return pl.BlockSpec((1, N, D, tile), lambda h, b: (h, 0, 0, b), memory_space=pltpu.VMEM)


def _bias_spec(N):
    return pl.BlockSpec((1, N, N, LANE), lambda h, b: (h, 0, 0, 0), memory_space=pltpu.VMEM)


def _seed_spec():
    return pl.BlockSpec((1,), lambda h, b: (0,), memory_space=pltpu.SMEM)


def _call_forward(qt, kt, vt, bias_l, tile, seed=None, rate=0.0):
    H, N, D, B = qt.shape
    grid = (H, B // tile)
    if seed is None:
        return pl.pallas_call(
            _attn_fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((H, N, D, B), qt.dtype),
            grid=grid,
            in_specs=[_nd_spec(N, D, tile)] * 3 + [_bias_spec(N)],
            out_specs=_nd_spec(N, D, tile),
            interpret=not _on_tpu(),
        )(qt, kt, vt, bias_l)
    return pl.pallas_call(
        functools.partial(_attn_fwd_dropout_kernel, rate),
        out_shape=jax.ShapeDtypeStruct((H, N, D, B), qt.dtype),
        grid=grid,
        in_specs=[_seed_spec()] + [_nd_spec(N, D, tile)] * 3 + [_bias_spec(N)],
        out_specs=_nd_spec(N, D, tile),
    )(seed, qt, kt, vt, bias_l)


def _call_backward(qt, kt, vt, bias_l, gt, tile, seed=None, rate=0.0):
    H, N, D, B = qt.shape
    grid = (H, B // tile)
    out_shape = (
        jax.ShapeDtypeStruct((H, N, D, B), qt.dtype),
        jax.ShapeDtypeStruct((H, N, D, B), kt.dtype),
        jax.ShapeDtypeStruct((H, N, D, B), vt.dtype),
        jax.ShapeDtypeStruct((H, N, N, LANE), jnp.float32),
    )
    out_specs = (
        _nd_spec(N, D, tile),
        _nd_spec(N, D, tile),
        _nd_spec(N, D, tile),
        _bias_spec(N),
    )
    if seed is None:
        return pl.pallas_call(
            _attn_bwd_kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[_nd_spec(N, D, tile)] * 3 + [_bias_spec(N), _nd_spec(N, D, tile)],
            out_specs=out_specs,
            interpret=not _on_tpu(),
        )(qt, kt, vt, bias_l, gt)
    return pl.pallas_call(
        functools.partial(_attn_bwd_dropout_kernel, rate),
        out_shape=out_shape,
        grid=grid,
        in_specs=[_seed_spec()] + [_nd_spec(N, D, tile)] * 3
        + [_bias_spec(N), _nd_spec(N, D, tile)],
        out_specs=out_specs,
    )(seed, qt, kt, vt, bias_l, gt)


def _to_lanes(arrs, tile):
    """[B, H, N, D] -> [H, N, D, Bp] with the window-batch padded to the tile."""
    B = arrs[0].shape[0]
    pad = (-B) % tile
    out = []
    for a in arrs:
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0), (0, 0), (0, 0)))
        out.append(a.transpose(1, 2, 3, 0))
    return out


def _fwd_impl(q, k, v, bias_l, seed=None, rate=0.0):
    B, H, N, D = q.shape
    if seed is None:
        tile = _pick_tile(N, D, B, n_nd_bufs=4, n_nn_bufs=4)
    else:
        tile = _dropout_tile(N, D, B)  # MUST match the backward's tile
    qt, kt, vt = _to_lanes((q, k, v), tile)
    out_t = _call_forward(qt, kt, vt, bias_l, tile, seed=seed, rate=rate)
    return out_t.transpose(3, 0, 1, 2)[:B]


def _bwd_impl(q, k, v, bias_l, g, seed=None, rate=0.0):
    B, H, N, D = q.shape
    # backward holds ~7 [N,D,TB] and ~6 [N,N,TB] live f32 buffers; this is
    # _dropout_tile's sizing, so dropout fwd and bwd tiles agree by design
    tile = _pick_tile(N, D, B, n_nd_bufs=7, n_nn_bufs=6)
    qt, kt, vt, gt = _to_lanes((q, k, v, g), tile)
    dq_t, dk_t, dv_t, dbias = _call_backward(qt, kt, vt, bias_l, gt, tile, seed=seed, rate=rate)
    dq = dq_t.transpose(3, 0, 1, 2)[:B]
    dk = dk_t.transpose(3, 0, 1, 2)[:B]
    dv = dv_t.transpose(3, 0, 1, 2)[:B]
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# public ops (custom VJP)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_window_attention(q, k, v, bias_l):
    """softmax(q kT + bias) v over tiny windows, fully fused fwd+bwd.

    q, k, v: [B, H, N, D] (any float dtype; q pre-scaled by the caller).
    bias_l: [H, N, N, 128] float32 — the per-lane bias pattern; lane l holds
    the bias of window (l mod nW), which requires nW | 128 (callers check).
    Returns [B, H, N, D] in q's dtype.
    """
    return _fwd_impl(q, k, v, bias_l)


def _fwd_rule(q, k, v, bias_l):
    return _fwd_impl(q, k, v, bias_l), (q, k, v, bias_l)


def _bwd_rule(res, g):
    q, k, v, bias_l = res
    return _bwd_impl(q, k, v, bias_l, g)


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_window_attention_dropout(q, k, v, bias_l, seed, rate):
    """Fused window attention with in-kernel attention dropout.

    seed: int32 [1] (vary per step); rate: static dropout rate in (0, 1).
    TPU-only (uses the hardware PRNG; no interpreter fallback) — callers gate
    on the backend. The backward regenerates the dropout mask from the same
    seed, so no attention residual is stored.
    """
    return _fwd_impl(q, k, v, bias_l, seed=seed, rate=rate)


def _fwd_rule_dropout(q, k, v, bias_l, seed, rate):
    return _fwd_impl(q, k, v, bias_l, seed=seed, rate=rate), (q, k, v, bias_l, seed)


def _bwd_rule_dropout(rate, res, g):
    q, k, v, bias_l, seed = res
    dq, dk, dv, dbias = _bwd_impl(q, k, v, bias_l, g, seed=seed, rate=rate)
    return dq, dk, dv, dbias, None


fused_window_attention_dropout.defvjp(_fwd_rule_dropout, _bwd_rule_dropout)


# ---------------------------------------------------------------------------
# multi-chip wrapper
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sharded_op(mesh, rate, with_dropout):
    """Build (and cache) the shard_map-wrapped fused op for a mesh.

    Mosaic kernels cannot be auto-partitioned by pjit; shard_map hands each
    device its [B/n, H, N, D] shard (bias replicated) and the kernels run
    per-device with no collectives in the forward — window attention is
    batch-parallel. The VJP is spelled out manually because the bias is
    replicated: its per-shard gradient needs an explicit psum over the data
    axis (shard_map's implicit transpose does not insert one under
    check_vma=False). With dropout, each device folds its axis index into
    the seed so masks differ across shards; the seed must be an int32 [1]."""

    data, repl = P("data"), P()

    def _local_seed(seed):
        return seed + jax.lax.axis_index("data").astype(jnp.int32) * 1000003

    if with_dropout:
        fwd_specs = (data, data, data, repl, repl)

        def fwd_body(q, k, v, bias_l, seed):
            return _fwd_impl(q, k, v, bias_l, seed=_local_seed(seed), rate=rate)

        def bwd_body(q, k, v, bias_l, g, seed):
            dq, dk, dv, dbias = _bwd_impl(q, k, v, bias_l, g, seed=_local_seed(seed), rate=rate)
            return dq, dk, dv, jax.lax.psum(dbias, "data")

    else:
        fwd_specs = (data, data, data, repl)

        def fwd_body(q, k, v, bias_l):
            return _fwd_impl(q, k, v, bias_l)

        def bwd_body(q, k, v, bias_l, g):
            dq, dk, dv, dbias = _bwd_impl(q, k, v, bias_l, g)
            return dq, dk, dv, jax.lax.psum(dbias, "data")

    fwd_sm = jax.shard_map(fwd_body, mesh=mesh, in_specs=fwd_specs,
                           out_specs=data, check_vma=False)
    bwd_specs = fwd_specs[:4] + (data,) + fwd_specs[4:]
    bwd_sm = jax.shard_map(bwd_body, mesh=mesh, in_specs=bwd_specs,
                           out_specs=(data, data, data, repl), check_vma=False)

    @jax.custom_vjp
    def op(q, k, v, bias_l, *seed):
        return fwd_sm(q, k, v, bias_l, *seed)

    def op_fwd(q, k, v, bias_l, *seed):
        return fwd_sm(q, k, v, bias_l, *seed), (q, k, v, bias_l, seed)

    def op_bwd(res, g):
        q, k, v, bias_l, seed = res
        dq, dk, dv, dbias = bwd_sm(q, k, v, bias_l, g, *seed)
        return (dq, dk, dv, dbias) + (None,) * len(seed)

    op.defvjp(op_fwd, op_bwd)
    return op


def sharded_window_attention(mesh, q, k, v, bias_l, seed=None, rate=0.0):
    """Fused window attention under shard_map over the mesh's ``data`` axis.

    The window-batch axis of q/k/v must shard evenly (callers check) and each
    shard must be a multiple of the bias period nW (true by construction:
    shards are whole samples x nW windows). bias_l is replicated.
    """
    if seed is None:
        return _sharded_op(mesh, 0.0, False)(q, k, v, bias_l)
    return _sharded_op(mesh, float(rate), True)(q, k, v, bias_l, seed)


# ---------------------------------------------------------------------------
# fused MLP: fc1 -> exact GELU -> dropout -> fc2 -> dropout in one VMEM pass
# per row tile. The hidden [rows, 4C] activation never touches HBM (XLA's
# lowering materialises it twice — once forward, once as a backward residual:
# ~300 MB/step of traffic at MOD stage-0 sizes). The backward regenerates
# both dropout masks from the forward's PRNG seed and recomputes the hidden,
# accumulating dw/db across row tiles in revisited output blocks.
# ---------------------------------------------------------------------------

MLP_TILE = 1024  # max token rows per kernel invocation


def _mlp_tile(C, H):
    # live f32 working set ~ tile * (4H + 3C) floats (z/h/dh/dz + x/g/dx)
    # plus 3 C*H weight/grad buffers; keep it under the scoped-VMEM limit
    tile = MLP_TILE
    while tile > 128 and tile * (4 * H + 3 * C) * 4 > 7 * 1024 * 1024:
        tile //= 2
    return tile


def mlp_fits(C, H):
    """Static feasibility of the fused MLP at (channels C, hidden H): the
    kernel keeps whole weight matrices in VMEM (w1/w2 + their grad
    accumulators in the backward), so wide layers can't fit at ANY row tile
    (measured: C=1024/H=4096 allocates 32 MB of scoped stack and aborts
    compile). Callers fall back to the plain nn.Dense math when False —
    e.g. MOD_WIDE stages 1-2."""
    weights = 4 * C * H * 4  # w1, w2, dw1, dw2 (f32 VMEM buffers, backward)
    working = _mlp_tile(C, H) * (4 * H + 3 * C) * 4
    return weights + working <= int(16 * 1024 * 1024 * 0.9)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs err
    1.5e-7): Mosaic has no erf primitive, and 1.5e-7 is far below bf16
    resolution. Sign-symmetric."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t - 0.284496736) * t
            + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(z):
    return 0.5 * z * (1.0 + _erf(z * 0.7071067811865476))


def _gelu_grad(z):
    cdf = 0.5 * (1.0 + _erf(z * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * z * z) * 0.3989422804014327
    return cdf + z * pdf


def _mlp_masks(seed_ref, rate, shape_h, shape_o):
    """Deterministic (seed, tile) keep-masks for both dropout sites; the
    backward calls this with the same seed/program id to regenerate them."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 92821)
    threshold = jnp.uint32(rate * 4294967296.0)
    keep1 = pltpu.bitcast(pltpu.prng_random_bits(shape_h), jnp.uint32) >= threshold
    keep2 = pltpu.bitcast(pltpu.prng_random_bits(shape_o), jnp.uint32) >= threshold
    return keep1, keep2


def _mlp_fwd_core(x, w1, b1, w2, b2, keep1, keep2, inv_keep):
    z = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1  # [R, H]
    h = _gelu_exact(z)
    if keep1 is not None:
        h = jnp.where(keep1, h * inv_keep, 0.0)
    y = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32) + b2
    if keep2 is not None:
        y = jnp.where(keep2, y * inv_keep, 0.0)
    return z, h, y


def _mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[...]
    _, _, y = _mlp_fwd_core(
        x, w1_ref[...].astype(x.dtype), b1_ref[...].astype(jnp.float32),
        w2_ref[...].astype(x.dtype), b2_ref[...].astype(jnp.float32),
        None, None, 1.0,
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _mlp_fwd_dropout_kernel(rate, seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[...]
    w2 = w2_ref[...].astype(x.dtype)
    keep1, keep2 = _mlp_masks(seed_ref, rate, (x.shape[0], w2.shape[0]), y_ref.shape)
    _, _, y = _mlp_fwd_core(
        x, w1_ref[...].astype(x.dtype), b1_ref[...].astype(jnp.float32),
        w2, b2_ref[...].astype(jnp.float32), keep1, keep2, 1.0 / (1.0 - rate),
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _mlp_bwd_math(x, w1, b1, w2, b2, g, keep1, keep2, inv_keep):
    z = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = _gelu_exact(z)
    if keep1 is not None:
        h_used = jnp.where(keep1, h * inv_keep, 0.0)
    else:
        h_used = h
    g2 = g if keep2 is None else jnp.where(keep2, g * inv_keep, 0.0)  # [R, C]
    g2b = g2.astype(x.dtype)
    dh = jnp.dot(g2b, w2.T, preferred_element_type=jnp.float32)  # [R, H]
    if keep1 is not None:
        dh = jnp.where(keep1, dh * inv_keep, 0.0)
    dz = dh * _gelu_grad(z)  # [R, H]
    dzb = dz.astype(x.dtype)
    dx = jnp.dot(dzb, w1.T, preferred_element_type=jnp.float32)
    dw1 = jnp.dot(x.T, dzb, preferred_element_type=jnp.float32)
    db1 = jnp.sum(dz, axis=0, keepdims=True)
    dw2 = jnp.dot(h_used.astype(x.dtype).T, g2b, preferred_element_type=jnp.float32)
    db2 = jnp.sum(g2, axis=0, keepdims=True)
    return dx, dw1, db1, dw2, db2


def _store_mlp_grads(outs, refs):
    dx, dw1, db1, dw2, db2 = outs
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref = refs
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw1_ref[...] = dw1_ref[...] + dw1
        db1_ref[...] = db1_ref[...] + db1
        dw2_ref[...] = dw2_ref[...] + dw2
        db2_ref[...] = db2_ref[...] + db2


def _mlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[...]
    outs = _mlp_bwd_math(
        x, w1_ref[...].astype(x.dtype), b1_ref[...].astype(jnp.float32),
        w2_ref[...].astype(x.dtype), b2_ref[...].astype(jnp.float32),
        g_ref[...].astype(jnp.float32), None, None, 1.0,
    )
    _store_mlp_grads(outs, (dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref))


def _mlp_bwd_dropout_kernel(rate, seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                            dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[...]
    w2 = w2_ref[...].astype(x.dtype)
    keep1, keep2 = _mlp_masks(seed_ref, rate, (x.shape[0], w2.shape[0]), g_ref.shape)
    outs = _mlp_bwd_math(
        x, w1_ref[...].astype(x.dtype), b1_ref[...].astype(jnp.float32),
        w2, b2_ref[...].astype(jnp.float32),
        g_ref[...].astype(jnp.float32), keep1, keep2, 1.0 / (1.0 - rate),
    )
    _store_mlp_grads(outs, (dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref))


def _mlp_seed_spec():
    return pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)


def _mlp_specs(C, H, tile):
    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    x_spec = pl.BlockSpec((tile, C), row, memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((C, H), fixed, memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, H), fixed, memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((H, C), fixed, memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((1, C), fixed, memory_space=pltpu.VMEM)
    return x_spec, w1_spec, b1_spec, w2_spec, b2_spec


def _mlp_pad(x, tile):
    T = x.shape[0]
    pad = (-T) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, T


def _mlp_fwd_impl(x, w1, b1, w2, b2, seed=None, rate=0.0):
    C, H = w1.shape
    tile = _mlp_tile(C, H)
    xp, T = _mlp_pad(x, tile)
    grid = (xp.shape[0] // tile,)
    x_spec, w1_spec, b1_spec, w2_spec, b2_spec = _mlp_specs(C, H, tile)
    y_spec = pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    b1_2d, b2_2d = b1.reshape(1, H), b2.reshape(1, C)
    if seed is None:
        y = pl.pallas_call(
            _mlp_fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((xp.shape[0], C), x.dtype),
            grid=grid,
            in_specs=[x_spec, w1_spec, b1_spec, w2_spec, b2_spec],
            out_specs=y_spec,
            interpret=not _on_tpu(),
        )(xp, w1, b1_2d, w2, b2_2d)
    else:
        y = pl.pallas_call(
            functools.partial(_mlp_fwd_dropout_kernel, rate),
            out_shape=jax.ShapeDtypeStruct((xp.shape[0], C), x.dtype),
            grid=grid,
            in_specs=[_mlp_seed_spec()] + [x_spec, w1_spec, b1_spec, w2_spec, b2_spec],
            out_specs=y_spec,
        )(seed, xp, w1, b1_2d, w2, b2_2d)
    return y[:T]


def _mlp_bwd_impl(x, w1, b1, w2, b2, g, seed=None, rate=0.0):
    C, H = w1.shape
    tile = _mlp_tile(C, H)
    xp, T = _mlp_pad(x, tile)
    gp, _ = _mlp_pad(g, tile)
    grid = (xp.shape[0] // tile,)
    x_spec, w1_spec, b1_spec, w2_spec, b2_spec = _mlp_specs(C, H, tile)
    g_spec = pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((xp.shape[0], C), x.dtype),   # dx
        jax.ShapeDtypeStruct((C, H), jnp.float32),          # dw1
        jax.ShapeDtypeStruct((1, H), jnp.float32),          # db1
        jax.ShapeDtypeStruct((H, C), jnp.float32),          # dw2
        jax.ShapeDtypeStruct((1, C), jnp.float32),          # db2
    )
    out_specs = (
        pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        w1_spec, b1_spec, w2_spec, b2_spec,
    )
    b1_2d, b2_2d = b1.reshape(1, H), b2.reshape(1, C)
    if seed is None:
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            _mlp_bwd_kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[x_spec, w1_spec, b1_spec, w2_spec, b2_spec, g_spec],
            out_specs=out_specs,
            interpret=not _on_tpu(),
        )(xp, w1, b1_2d, w2, b2_2d, gp)
    else:
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_mlp_bwd_dropout_kernel, rate),
            out_shape=out_shape,
            grid=grid,
            in_specs=[_mlp_seed_spec()] + [x_spec, w1_spec, b1_spec, w2_spec, b2_spec, g_spec],
            out_specs=out_specs,
        )(seed, xp, w1, b1_2d, w2, b2_2d, gp)
    return dx[:T], dw1, db1.reshape(H), dw2, db2.reshape(C)


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """fc1 -> exact-erf GELU -> fc2 on [T, C] rows, fully fused fwd+bwd.
    Weights are cast to x's dtype for the MXU dots (f32 accumulation), so a
    bf16 model matches Dense(bf16) -> gelu -> Dense(bf16) within rounding and
    the f32 interpret-mode tests are exact to ~1e-6.
    """
    return _mlp_fwd_impl(x, w1, b1, w2, b2)


def _fmlp_fwd(x, w1, b1, w2, b2):
    return _mlp_fwd_impl(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fmlp_bwd(res, g):
    return _mlp_bwd_impl(*res, g)


fused_mlp.defvjp(_fmlp_fwd, _fmlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_mlp_dropout(x, w1, b1, w2, b2, seed, rate):
    """fused_mlp with dropout after the GELU and after fc2 (the reference's
    Mlp places one after each layer, same rate). seed: int32 [1]; TPU-only
    (hardware PRNG); the backward regenerates both masks from the seed."""
    return _mlp_fwd_impl(x, w1, b1, w2, b2, seed=seed, rate=rate)


def _fmlp_fwd_dropout(x, w1, b1, w2, b2, seed, rate):
    return _mlp_fwd_impl(x, w1, b1, w2, b2, seed=seed, rate=rate), (x, w1, b1, w2, b2, seed)


def _fmlp_bwd_dropout(rate, res, g):
    x, w1, b1, w2, b2, seed = res
    return _mlp_bwd_impl(x, w1, b1, w2, b2, g, seed=seed, rate=rate) + (None,)


fused_mlp_dropout.defvjp(_fmlp_fwd_dropout, _fmlp_bwd_dropout)


@functools.lru_cache(maxsize=None)
def _sharded_mlp_op(mesh, rate, with_dropout):
    """shard_map wrap: rows shard over ``data``, weights replicate, and the
    weight/bias gradients psum over the axis (manual VJP — same reason as
    _sharded_op)."""
    data, repl = P("data"), P()

    def _local_seed(seed):
        return seed + jax.lax.axis_index("data").astype(jnp.int32) * 1000003

    if with_dropout:
        fwd_specs = (data, repl, repl, repl, repl, repl)

        def fwd_body(x, w1, b1, w2, b2, seed):
            return _mlp_fwd_impl(x, w1, b1, w2, b2, seed=_local_seed(seed), rate=rate)

        def bwd_body(x, w1, b1, w2, b2, g, seed):
            dx, dw1, db1, dw2, db2 = _mlp_bwd_impl(
                x, w1, b1, w2, b2, g, seed=_local_seed(seed), rate=rate
            )
            return dx, *jax.lax.psum((dw1, db1, dw2, db2), "data")

    else:
        fwd_specs = (data, repl, repl, repl, repl)

        def fwd_body(x, w1, b1, w2, b2):
            return _mlp_fwd_impl(x, w1, b1, w2, b2)

        def bwd_body(x, w1, b1, w2, b2, g):
            dx, dw1, db1, dw2, db2 = _mlp_bwd_impl(x, w1, b1, w2, b2, g)
            return dx, *jax.lax.psum((dw1, db1, dw2, db2), "data")

    fwd_sm = jax.shard_map(fwd_body, mesh=mesh, in_specs=fwd_specs,
                           out_specs=data, check_vma=False)
    bwd_specs = fwd_specs[:5] + (data,) + fwd_specs[5:]
    bwd_sm = jax.shard_map(bwd_body, mesh=mesh, in_specs=bwd_specs,
                           out_specs=(data, repl, repl, repl, repl), check_vma=False)

    @jax.custom_vjp
    def op(x, w1, b1, w2, b2, *seed):
        return fwd_sm(x, w1, b1, w2, b2, *seed)

    def op_fwd(x, w1, b1, w2, b2, *seed):
        return fwd_sm(x, w1, b1, w2, b2, *seed), (x, w1, b1, w2, b2, seed)

    def op_bwd(res, g):
        x, w1, b1, w2, b2, seed = res
        dx, dw1, db1, dw2, db2 = bwd_sm(x, w1, b1, w2, b2, g, *seed)
        return (dx, dw1, db1, dw2, db2) + (None,) * len(seed)

    op.defvjp(op_fwd, op_bwd)
    return op


def sharded_fused_mlp(mesh, x, w1, b1, w2, b2, seed=None, rate=0.0):
    """fused_mlp under shard_map over the mesh's ``data`` axis (row-parallel;
    callers ensure the row count shards evenly)."""
    if seed is None:
        return _sharded_mlp_op(mesh, 0.0, False)(x, w1, b1, w2, b2)
    return _sharded_mlp_op(mesh, float(rate), True)(x, w1, b1, w2, b2, seed)


# ---------------------------------------------------------------------------
# whole-block attention: qkv projection + window attention + output
# projection in ONE VMEM pass per window-batch tile (fwd AND bwd).
#
# Why: the separate qkv Dense runs on the window-partitioned layout, so its
# BACKWARD materialises the [B_, N, 3C] gradient and converts it back to
# image layout — profiled at ~13 ms of an 84 ms SW_Transformer step (226 MB
# reshape+copy chains running at 63 GB/s on v5e; see BASELINE.md roofline
# notes). With the projections inside the kernel, only x and y (1/3 the
# bytes) ever cross layouts, weight gradients are accumulated in-kernel
# across tiles (revisited output blocks, like the bias gradient), and the
# q,k,v/attention intermediates never touch HBM in either pass.
#
# The q scaling is folded into the caller's Wqkv/bqkv (scale the q-part
# columns) so the kernel needs no scale parameter and autodiff handles the
# chain rule outside. Reference math reproduced:
# src/models/SwinModules.py:113-152 (qkv Linear -> scaled dot-product with
# relative-position bias (+ shift mask) -> proj Linear).
# ---------------------------------------------------------------------------


def _block_tile(N, C, B):
    """Lane tile shared by the whole-block forward AND backward (the dropout
    keep-mask regeneration requires identical tiling — see _dropout_tile).
    Sized for the backward's working set: ~11 [N,C,TB] + ~6 [N,N,TB] f32
    buffers live at peak."""
    return _pick_tile(N, C, B, n_nd_bufs=11, n_nn_bufs=6)


# Mosaic's scoped-VMEM stack limit; the minimum lane tile is LANE=128, so
# wide channel dims can make the whole-block working set unfittable at ANY
# tile (measured: C=512, N=9 allocates 18.3 MB of stack and aborts compile).
_SCOPED_VMEM_LIMIT = 16 * 1024 * 1024


def wblock_fits(N, C):
    """Static feasibility of the MONOLITHIC whole-block kernel at (window N,
    channels C): True iff the backward's working set at the minimum tile fits
    Mosaic's 16 MB scoped-VMEM stack (with headroom for compiler
    temporaries). When False the impl dispatches to the per-head-gridded
    variant below (grid (batch-tile, head)); only if THAT doesn't fit either
    (wblock_fits_any False) do callers fall back to the attention-only
    kernel."""
    working_set = (11 * N * C + 6 * N * N) * LANE * 4
    return working_set <= int(_SCOPED_VMEM_LIMIT * 0.9)


def _perhead_lane_bytes(N, C, hd, cb):
    """Backward working set per lane of the per-head kernel: x+dy (compute
    dtype) and the f32 dx accumulator are [N, C, ·]; q/k/v/g + dq/dk/dv are
    per-head [N, hd, ·]; ~8 [N, N, ·] attention temporaries."""
    return N * C * (2 * cb + 4) + 7 * N * hd * 4 + 8 * N * N * 4


def _block_tile_perhead(N, C, hd, B, cb):
    """Lane tile shared by the per-head forward AND backward (the stored
    dropout mask requires identical tiling)."""
    tile = MAX_TILE
    while tile > LANE and _perhead_lane_bytes(N, C, hd, cb) * tile > _VMEM_BUDGET:
        tile //= 2
    if B < tile:
        tile = max(LANE, ((B + LANE - 1) // LANE) * LANE)
    return tile


# Scoped-VMEM limit for the per-head kernels. Mosaic's 16 MB default rejected
# the backward at MOD_WIDE C=512 (measured 17.58 MB in the full step, 18.03 MB
# standalone — a hardware compile FAILURE that round 4 shipped unmeasured); a
# pallas kernel owns the chip's 128 MB VMEM while it runs, so raising the
# per-kernel limit is free as long as limit + double-buffered blocks fit.
_PH_VMEM_LIMIT = 100 * 1024 * 1024

# Measured calibration of _perhead_lane_bytes against Mosaic's actual stack
# allocation: the formula predicts 9.18 MB at (N=9, C=512, hd=128, tile=128)
# where the compiler allocates 18.03 MB (stack liveness does not reuse the
# per-n dot temporaries the estimate assumed shared). Apply the measured
# ~2x with headroom.
_PH_STACK_FACTOR = 2.5


def wblock_perhead_fits(N, C, H):
    """Static feasibility of the per-head whole-block variant: the working
    set scales with C (x/dy/dx tiles) + hd (per-head q/k/v), so it fits wide
    stages the monolithic kernel can't — under the raised _PH_VMEM_LIMIT
    (MOD_WIDE C=512: ~18 MB measured; C=1024/hd=128: ~35 MB estimated with
    the calibration factor)."""
    hd = C // max(H, 1)
    cb = 2 if C >= 128 else 4  # _wblock_compute_dtype switches to bf16 at C>=128
    est = _perhead_lane_bytes(N, C, hd, cb) * LANE * _PH_STACK_FACTOR
    # persistent weight-grad scratch (f32 dw3 + dwp + dbias accumulators,
    # H*hd == C so the total is ~16*C*C bytes regardless of H)
    scratch = 4 * (3 * C * C + C * C + 3 * C + H * N * N * LANE)
    return est + scratch <= int(_PH_VMEM_LIMIT * 0.9)


def wblock_fits_any(N, C, H):
    """True iff SOME whole-block variant (monolithic or per-head) fits."""
    return wblock_fits(N, C) or wblock_perhead_fits(N, C, H)


def _wblock_fwd_math(x, wqkv, bqkv, wproj, bproj, bias_full, H, seed_ref, rate,
                     mask_ref=None):
    """x: [N, C, TB] in storage dtype; dots run in that dtype with f32
    accumulation (matches the backward's recompute bit-for-bit). Returns
    (qkv [N, 3C, TB] f32, attn_out [N, C, TB] f32, y [N, C, TB] f32)."""
    N, C, TB = x.shape
    hd = C // H
    bq = bqkv.astype(jnp.float32).reshape(-1, 1)
    qkv = jnp.stack(
        [jnp.dot(wqkv.T, x[n], preferred_element_type=jnp.float32) + bq for n in range(N)]
    )  # [N, 3C, TB]
    outs = []
    for h in range(H):
        q_h = qkv[:, h * hd : (h + 1) * hd, :]
        k_h = qkv[:, C + h * hd : C + (h + 1) * hd, :]
        v_h = qkv[:, 2 * C + h * hd : 2 * C + (h + 1) * hd, :]
        attn = _scores_softmax(q_h, k_h, bias_full[h])
        if seed_ref is not None:
            keep = _dropout_mask_head(seed_ref, h, attn.shape, rate)
            if mask_ref is not None:
                mask_ref[h] = keep.astype(mask_ref.dtype)
            attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
        outs.append(_weighted_sum(attn, v_h))  # [N, hd, TB]
    attn_out = jnp.concatenate(outs, axis=1)  # [N, C, TB]
    bp = bproj.astype(jnp.float32).reshape(-1, 1)
    y = jnp.stack(
        [jnp.dot(wproj.T, attn_out[n].astype(x.dtype), preferred_element_type=jnp.float32)
         + bp for n in range(N)]
    )
    return qkv, attn_out, y


def _dropout_mask_head(seed_ref, h, shape, rate):
    """Per-(tile, head) keep mask; forward and backward call this with the
    same seed, program id, head index and tile shape."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 65537 + h * 7919)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(rate * 4294967296.0)
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _wblock_fwd_kernel(H, rate, *refs):
    if rate > 0.0:
        # dropout: the keep-mask is WRITTEN OUT as a residual (bf16 0/1,
        # [H, N, N, TB] per tile) — regenerating it from the PRNG in the
        # backward kernel proved unreliable in this larger kernel (the
        # regenerated mask disagreed with the forward's, caught by the
        # finite-difference check in tools/tpu_selftest.py); the stored mask
        # makes fwd/bwd agreement structural for ~0.03 ms/step of HBM traffic
        seed_ref, x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, y_ref, mask_ref = refs
    else:
        seed_ref = None
        mask_ref = None
        x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, y_ref = refs
    x = x_ref[...]
    bias_full = _expand_bias(bias_ref[...], x.shape[-1])  # [H, N, N, TB]
    _, _, y = _wblock_fwd_math(
        x, wqkv_ref[...], bqkv_ref[...], wproj_ref[...], bproj_ref[...],
        bias_full, H, seed_ref, rate, mask_ref=mask_ref,
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _wblock_bwd_kernel(H, rate, *refs):
    if rate > 0.0:
        # dropout: the keep-mask comes in as the forward's stored residual
        (x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, dy_ref, mask_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref) = refs
    else:
        mask_ref = None
        (x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, dy_ref,
         dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref) = refs
    # inputs stay in their storage dtype for the MXU dots (f32 accumulate);
    # only the attention math runs in f32 — the per-head gradients are
    # accumulated straight into the weight-gradient SLICES instead of being
    # concatenated into [N, 3C, TB] buffers (at C=256/tile=128 the concat
    # formulation peaked at 17.4 MB of scoped VMEM, over the 16 MB limit)
    x = x_ref[...]
    wqkv = wqkv_ref[...]
    wproj = wproj_ref[...]
    dy = dy_ref[...]
    N, C, TB = x.shape
    hd = C // H
    bias_full = _expand_bias(bias_ref[...], TB)
    # recompute forward intermediates (residual-free: only x and dy are read)
    bqkv = bqkv_ref[...].astype(jnp.float32).reshape(-1, 1)
    qkv = jnp.stack(
        [jnp.dot(wqkv.T, x[n], preferred_element_type=jnp.float32) + bqkv for n in range(N)]
    )
    # d(attn_out)[n] = Wproj @ dy[n]   (y = Wproj^T a + b)
    g = jnp.stack([jnp.dot(wproj, dy[n], preferred_element_type=jnp.float32) for n in range(N)])
    # per-head weight-gradient PIECES ([C, hd] / [hd, C] — weight-sized, not
    # activation-sized) assembled by concatenation at the end: Mosaic has no
    # scatter-add lowering, and the activation-sized [N, 3C, TB] concat
    # formulation peaked at 17.4 MB of scoped VMEM (over the 16 MB limit)
    dx = jnp.zeros((N, C, TB), jnp.float32)
    dw_pieces = {0: [], 1: [], 2: []}   # part -> [C, hd] per head
    dbq_pieces = {0: [], 1: [], 2: []}  # part -> [1, hd] per head
    dwproj_rows = []                    # [hd, C] per head
    db_tiles = []
    xb = x.astype(dy.dtype)
    for h in range(H):
        q_h = qkv[:, h * hd : (h + 1) * hd, :]
        k_h = qkv[:, C + h * hd : C + (h + 1) * hd, :]
        v_h = qkv[:, 2 * C + h * hd : 2 * C + (h + 1) * hd, :]
        g_h = g[:, h * hd : (h + 1) * hd, :]
        if mask_ref is not None:
            # f32 compare: Mosaic rejects bf16 comparisons on this target
            keep = mask_ref[h].astype(jnp.float32) > 0.5
            dq, dk, dv, ds = _bwd_math(q_h, k_h, v_h, g_h, bias_full[h], keep, 1.0 / (1.0 - rate))
            attn = _scores_softmax(q_h, k_h, bias_full[h])
            a_used = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
        else:
            dq, dk, dv, ds = _bwd_math(q_h, k_h, v_h, g_h, bias_full[h], None, None)
            a_used = _scores_softmax(q_h, k_h, bias_full[h])
        ao_h = _weighted_sum(a_used, v_h)  # [N, hd, TB]
        dwproj_rows.append(
            sum(jnp.dot(ao_h[n].astype(dy.dtype), dy[n].T,
                        preferred_element_type=jnp.float32) for n in range(N))
        )
        for part, dpart in ((0, dq), (1, dk), (2, dv)):
            c0 = part * C + h * hd
            w_slice = wqkv[:, c0 : c0 + hd]  # [C, hd]
            dpb = [dpart[n].astype(xb.dtype) for n in range(N)]
            dx = dx + jnp.stack(
                [jnp.dot(w_slice, dpb[n], preferred_element_type=jnp.float32) for n in range(N)]
            )
            dw_pieces[part].append(
                sum(jnp.dot(xb[n], dpb[n].T, preferred_element_type=jnp.float32)
                    for n in range(N))
            )
            dbq_pieces[part].append(dpart.sum(axis=(0, 2)).reshape(1, -1))
        # fold tile lanes onto the 128-lane bias pattern
        db = ds[:, :, 0:LANE]
        for r in range(1, TB // LANE):
            db = db + ds[:, :, r * LANE : (r + 1) * LANE]
        db_tiles.append(db)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dwqkv = jnp.concatenate(
        [p for part in (0, 1, 2) for p in dw_pieces[part]], axis=1
    )  # [C, 3C], column order q-heads | k-heads | v-heads (matches the fwd)
    dbqkv = jnp.concatenate(
        [p for part in (0, 1, 2) for p in dbq_pieces[part]], axis=1
    )
    dwproj = jnp.concatenate(dwproj_rows, axis=0)  # [C, C]
    dbproj = dy.astype(jnp.float32).sum(axis=(0, 2)).reshape(1, -1)
    dbias = jnp.stack(db_tiles)  # [H, N, N, 128]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = dwqkv
        dbqkv_ref[...] = dbqkv
        dwproj_ref[...] = dwproj
        dbproj_ref[...] = dbproj
        dbias_ref[...] = dbias

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dwqkv_ref[...] = dwqkv_ref[...] + dwqkv
        dbqkv_ref[...] = dbqkv_ref[...] + dbqkv
        dwproj_ref[...] = dwproj_ref[...] + dwproj
        dbproj_ref[...] = dbproj_ref[...] + dbproj
        dbias_ref[...] = dbias_ref[...] + dbias


def _ncb_spec(N, C, tile):
    return pl.BlockSpec((N, C, tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM)


def _fixed_spec(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * n, memory_space=pltpu.VMEM)


def _wblock_seed_spec():
    return pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM)


def _to_ncb(x, tile):
    """[B_, N, C] -> [N, C, Bp] with the window batch padded to the tile."""
    B = x.shape[0]
    pad = (-B) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    return x.transpose(1, 2, 0)


def _wblock_compute_dtype(C, dtype):
    """f32 activations at C>=128 overflow the 16 MB scoped-VMEM stack in the
    backward (measured 17.9 MB at C=256/tile=128); compute in bf16 there —
    Mosaic lowers the in-kernel f32 dots as single-pass bf16 regardless, so
    the extra rounding is storage-only (~1e-3 rel). Outputs keep the input
    dtype."""
    if C >= 128 and dtype == jnp.float32:
        return jnp.bfloat16
    return dtype


def _mask_spec(H, N, tile):
    return pl.BlockSpec((H, N, N, tile), lambda b: (0, 0, 0, b), memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# per-head whole-block variant: grid (batch-tile, head). Each invocation
# projects q/k/v for ONE head ([N, hd, TB] instead of [N, 3C, TB]), so the
# VMEM working set scales with C + hd rather than 3C — this is what lets the
# whole-block fusion cover the wide stages (MOD_WIDE C=512/1024) that the
# monolithic kernel's 26 MB working set cannot. The head axis is the INNER
# grid dim, so the x / dy / dx / y blocks (index constant in h) stay resident
# in VMEM across the head sweep; y and dx accumulate across heads in f32
# revisited blocks, while weight/bias gradients accumulate across batch
# tiles exactly like the monolithic kernel.
# ---------------------------------------------------------------------------


def _wblock_ph_fwd_kernel(rate, *refs):
    if rate > 0.0:
        (seed_ref, x_ref, w3_ref, bq3_ref, wp_ref, bp_ref, bias_ref,
         y_ref, mask_ref) = refs
    else:
        seed_ref = mask_ref = None
        x_ref, w3_ref, bq3_ref, wp_ref, bp_ref, bias_ref, y_ref = refs
    x = x_ref[...]
    N = x.shape[0]
    w3 = w3_ref[0]            # [3, C, hd] compute dtype (head-leading layout)
    bq3 = bq3_ref[0].astype(jnp.float32)  # [3, 1, hd]
    wp = wp_ref[...]          # [hd, C]
    bias = _expand_bias(bias_ref[0], x.shape[-1])  # [N, N, TB]
    parts = []
    for part in range(3):
        bqp = bq3[part].reshape(-1, 1)
        parts.append(jnp.stack(
            [jnp.dot(w3[part].T, x[n], preferred_element_type=jnp.float32) + bqp
             for n in range(N)]
        ))  # [N, hd, TB]
    q, k, v = parts
    attn = _scores_softmax(q, k, bias)
    if seed_ref is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 65537 + pl.program_id(1) * 7919)
        bits = pltpu.prng_random_bits(attn.shape)
        keep = pltpu.bitcast(bits, jnp.uint32) >= jnp.uint32(rate * 4294967296.0)
        mask_ref[0] = keep.astype(mask_ref.dtype)
        attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
    ao = _weighted_sum(attn, v)  # [N, hd, TB]
    y_h = jnp.stack(
        [jnp.dot(wp.T, ao[n].astype(x.dtype), preferred_element_type=jnp.float32)
         for n in range(N)]
    )  # [N, C, TB] f32

    @pl.when(pl.program_id(1) == 0)
    def _init():
        y_ref[...] = y_h + bp_ref[...].astype(jnp.float32).reshape(-1, 1)

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        y_ref[...] = y_ref[...] + y_h


def _wblock_ph_bwd_kernel(rate, *refs):
    if rate > 0.0:
        (x_ref, w3_ref, bq3_ref, wp_ref, bias_ref, dy_ref, mask_ref,
         dx_ref, dw3_ref, dbq3_ref, dwp_ref, dbias_ref,
         dw3_acc, dbq3_acc, dwp_acc, dbias_acc) = refs
    else:
        mask_ref = None
        (x_ref, w3_ref, bq3_ref, wp_ref, bias_ref, dy_ref,
         dx_ref, dw3_ref, dbq3_ref, dwp_ref, dbias_ref,
         dw3_acc, dbq3_acc, dwp_acc, dbias_acc) = refs
    x = x_ref[...]
    dy = dy_ref[...]
    N, C, TB = x.shape
    w3 = w3_ref[0]
    bq3 = bq3_ref[0].astype(jnp.float32)
    wp = wp_ref[...]
    bias = _expand_bias(bias_ref[0], TB)
    parts = []
    for part in range(3):
        bqp = bq3[part].reshape(-1, 1)
        parts.append(jnp.stack(
            [jnp.dot(w3[part].T, x[n], preferred_element_type=jnp.float32) + bqp
             for n in range(N)]
        ))
    q, k, v = parts
    g_h = jnp.stack(
        [jnp.dot(wp, dy[n], preferred_element_type=jnp.float32) for n in range(N)]
    )  # [N, hd, TB]
    if mask_ref is not None:
        keep = mask_ref[0].astype(jnp.float32) > 0.5
        dq, dk, dv, ds = _bwd_math(q, k, v, g_h, bias, keep, 1.0 / (1.0 - rate))
        attn = _scores_softmax(q, k, bias)
        a_used = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
    else:
        dq, dk, dv, ds = _bwd_math(q, k, v, g_h, bias, None, None)
        a_used = _scores_softmax(q, k, bias)
    ao = _weighted_sum(a_used, v)
    dwp = sum(
        jnp.dot(ao[n].astype(dy.dtype), dy[n].T, preferred_element_type=jnp.float32)
        for n in range(N)
    )  # [hd, C]
    # dx accumulates DIRECTLY into the revisited output block instead of a
    # local f32 [N, C, TB] accumulator: the local (plus its stack temp) pushed
    # the scoped-VMEM stack to 17.58 MB at MOD_WIDE C=512 — over Mosaic's
    # 16 MB limit (hardware compile failure, BENCH round 5); in-place
    # read-modify-write of the out ref reuses the block buffer that exists
    # anyway.
    dw3_parts, dbq3_parts = [], []
    for part, dpart in ((0, dq), (1, dk), (2, dv)):
        dpb = [dpart[n].astype(x.dtype) for n in range(N)]
        dx_part = jnp.stack(
            [jnp.dot(w3[part], dpb[n], preferred_element_type=jnp.float32) for n in range(N)]
        )
        if part == 0:
            @pl.when(pl.program_id(1) == 0)
            def _dx_init(dx_part=dx_part):
                dx_ref[...] = dx_part

            @pl.when(pl.program_id(1) != 0)
            def _dx_acc(dx_part=dx_part):
                dx_ref[...] = dx_ref[...] + dx_part
        else:
            dx_ref[...] = dx_ref[...] + dx_part
        dw3_parts.append(
            sum(jnp.dot(x[n], dpb[n].T, preferred_element_type=jnp.float32) for n in range(N))
        )
        dbq3_parts.append(dpart.sum(axis=(0, 2)).reshape(1, -1))
    dw3 = jnp.stack(dw3_parts)    # [3, C, hd]
    dbq3 = jnp.stack(dbq3_parts)  # [3, 1, hd]
    db = ds[:, :, 0:LANE]
    for r in range(1, TB // LANE):
        db = db + ds[:, :, r * LANE : (r + 1) * LANE]

    # Weight/bias grads accumulate across batch tiles (the OUTER grid dim),
    # but their output blocks are indexed by h (the INNER dim) — revisits are
    # NON-consecutive, and Pallas only guarantees revisited output buffers
    # keep their contents across consecutive grid steps. Accumulating into
    # the output refs directly corrupted dwqkv/dwproj ~100% at H>=4 with
    # nb>=4 batch tiles on hardware (round-5 probe; round 4's selftest used
    # nb=1, which never revisits, and hid it). Accumulate in VMEM scratch —
    # scratch persists across the entire grid — and flush each head's block
    # on its final visit (b == nb-1).
    hsl = pl.ds(pl.program_id(1), 1)

    @pl.when(pl.program_id(0) == 0)
    def _w_init():
        dw3_acc[hsl] = dw3[None]
        dbq3_acc[hsl] = dbq3[None]
        dwp_acc[hsl] = dwp[None]
        dbias_acc[hsl] = db[None]

    @pl.when(pl.program_id(0) != 0)
    def _w_acc():
        dw3_acc[hsl] = dw3_acc[hsl] + dw3[None]
        dbq3_acc[hsl] = dbq3_acc[hsl] + dbq3[None]
        dwp_acc[hsl] = dwp_acc[hsl] + dwp[None]
        dbias_acc[hsl] = dbias_acc[hsl] + db[None]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _w_flush():
        dw3_ref[...] = dw3_acc[hsl]
        dbq3_ref[...] = dbq3_acc[hsl]
        dwp_ref[...] = dwp_acc[hsl][0]
        dbias_ref[...] = dbias_acc[hsl]


def _ph_specs(N, C, hd, tile):
    # the head axis is LEADING on the weight/bias layouts: Mosaic requires
    # last-dim blocks to be 128-divisible or the full axis, so a per-head
    # slice of the fused [C, 3C] columns (hd = 64 typical) is not a legal
    # block — [H, 3, C, hd] makes the head slice a leading-dim index and the
    # trailing (C, hd) dims full-axis blocks (caught by tpu_selftest on
    # hardware; interpret mode does not enforce the constraint)
    return {
        "x": pl.BlockSpec((N, C, tile), lambda b, h: (0, 0, b), memory_space=pltpu.VMEM),
        "w3": pl.BlockSpec((1, 3, C, hd), lambda b, h: (h, 0, 0, 0), memory_space=pltpu.VMEM),
        "bq3": pl.BlockSpec((1, 3, 1, hd), lambda b, h: (h, 0, 0, 0), memory_space=pltpu.VMEM),
        "wp": pl.BlockSpec((hd, C), lambda b, h: (h, 0), memory_space=pltpu.VMEM),
        "bp": pl.BlockSpec((1, C), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        "bias": pl.BlockSpec((1, N, N, LANE), lambda b, h: (h, 0, 0, 0), memory_space=pltpu.VMEM),
        "mask": pl.BlockSpec((1, N, N, tile), lambda b, h: (h, 0, 0, b), memory_space=pltpu.VMEM),
        "seed": pl.BlockSpec((1,), lambda b, h: (0,), memory_space=pltpu.SMEM),
    }


def _ph_weights(wqkv, bqkv, H, hd=None):
    """Fused [C, 3C'] (column order part|head|dim) -> head-leading
    [H, 3, C, hd] weights and [H, 3, 1, hd] biases. C' = H*hd; under tensor
    parallelism H counts only the shard's LOCAL heads (C' < C), so hd must be
    passed explicitly there."""
    C = wqkv.shape[0]
    hd = hd or C // H
    w3 = wqkv.reshape(C, 3, H, hd).transpose(2, 1, 0, 3)
    bq3 = bqkv.reshape(3, H, hd).transpose(1, 0, 2)[:, :, None, :]
    return w3, bq3


def _wblock_ph_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, seed=None, rate=0.0,
                        want_mask=False, head_dim=None):
    B, N, C = x.shape
    H = bias_l.shape[0]
    hd = head_dim or C // H
    cdt = _wblock_compute_dtype(C, x.dtype)
    tile = _block_tile_perhead(N, C, hd, B, 2 if cdt == jnp.bfloat16 else 4)
    out_dtype = x.dtype
    x, wqkv, wproj = x.astype(cdt), wqkv.astype(cdt), wproj.astype(cdt)
    w3, bq3 = _ph_weights(wqkv, bqkv, H, hd)
    xt = _to_ncb(x, tile)
    Bp = xt.shape[-1]
    grid = (Bp // tile, H)
    sp = _ph_specs(N, C, hd, tile)
    in_specs = [sp["x"], sp["w3"], sp["bq3"], sp["wp"], sp["bp"], sp["bias"]]
    operands = [xt, w3, bq3, wproj, bproj.reshape(1, -1), bias_l]
    out_shape = jax.ShapeDtypeStruct((N, C, Bp), jnp.float32)
    out_specs = sp["x"]
    if seed is not None:
        in_specs = [sp["seed"]] + in_specs
        operands = [seed] + operands
        out_shape = (out_shape, jax.ShapeDtypeStruct((H, N, N, Bp), jnp.bfloat16))
        out_specs = (out_specs, sp["mask"])
    outs = pl.pallas_call(
        functools.partial(_wblock_ph_fwd_kernel, float(rate) if seed is not None else 0.0),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_PH_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(*operands)
    if seed is not None:
        y_t, mask = outs
        y = y_t.transpose(2, 0, 1)[:B].astype(out_dtype)
        return (y, mask) if want_mask else y
    return outs.transpose(2, 0, 1)[:B].astype(out_dtype)


def _wblock_ph_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask=None, rate=0.0,
                        head_dim=None):
    B, N, C = x.shape
    H = bias_l.shape[0]
    hd = head_dim or C // H
    cdt = _wblock_compute_dtype(C, x.dtype)
    tile = _block_tile_perhead(N, C, hd, B, 2 if cdt == jnp.bfloat16 else 4)
    out_dtype = x.dtype
    dbproj = dy.astype(jnp.float32).sum(axis=(0, 1))  # padded lanes excluded here
    x, wqkv, wproj, dy = (a.astype(cdt) for a in (x, wqkv, wproj, dy))
    w3, bq3 = _ph_weights(wqkv, bqkv, H, hd)
    xt = _to_ncb(x, tile)
    dyt = _to_ncb(dy, tile)
    Bp = xt.shape[-1]
    grid = (Bp // tile, H)
    sp = _ph_specs(N, C, hd, tile)
    in_specs = [sp["x"], sp["w3"], sp["bq3"], sp["wp"], sp["bias"], sp["x"]]
    operands = [xt, w3, bq3, wproj, bias_l, dyt]
    if mask is not None:
        in_specs = in_specs + [sp["mask"]]
        operands = operands + [mask]
    out_shape = (
        jax.ShapeDtypeStruct((N, C, Bp), jnp.float32),       # dx
        jax.ShapeDtypeStruct((H, 3, C, hd), jnp.float32),    # dw3 (head-leading)
        jax.ShapeDtypeStruct((H, 3, 1, hd), jnp.float32),    # dbq3
        jax.ShapeDtypeStruct((H * hd, C), jnp.float32),      # dwproj (== [C, C] off-TP)
        jax.ShapeDtypeStruct(bias_l.shape, jnp.float32),     # dbias
    )
    out_specs = (
        sp["x"],
        pl.BlockSpec((1, 3, C, hd), lambda b, h: (h, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, 1, hd), lambda b, h: (h, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hd, C), lambda b, h: (h, 0), memory_space=pltpu.VMEM),
        sp["bias"],
    )
    # persistent accumulators for the cross-batch-tile weight-grad reduction
    # (see _wblock_ph_bwd_kernel: output blocks indexed by the inner grid dim
    # cannot be accumulated across the outer dim)
    scratch_shapes = [
        pltpu.VMEM((H, 3, C, hd), jnp.float32),
        pltpu.VMEM((H, 3, 1, hd), jnp.float32),
        pltpu.VMEM((H, hd, C), jnp.float32),
        pltpu.VMEM(bias_l.shape, jnp.float32),
    ]
    dx_t, dw3, dbq3, dwproj, dbias = pl.pallas_call(
        functools.partial(_wblock_ph_bwd_kernel, float(rate) if mask is not None else 0.0),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_PH_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(*operands)
    dx = dx_t.transpose(2, 0, 1)[:B].astype(out_dtype)
    # [H, 3, C, hd] -> fused [C, 3*H*hd] (column order part|head|dim)
    dwqkv = dw3.transpose(2, 1, 0, 3).reshape(C, -1)
    dbqkv = dbq3.transpose(1, 0, 2, 3).reshape(-1)  # [3*H*hd], q | k | v order
    return dx, dwqkv, dbqkv, dwproj, dbproj, dbias


def _wblock_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, seed=None, rate=0.0,
                     want_mask=False):
    B, N, C = x.shape
    H = bias_l.shape[0]
    if not wblock_fits(N, C):
        # wide stages: per-head grid keeps the working set ~C + C/H per lane
        return _wblock_ph_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l,
                                   seed=seed, rate=rate, want_mask=want_mask)
    tile = _block_tile(N, C, B)
    cdt = _wblock_compute_dtype(C, x.dtype)
    out_dtype = x.dtype
    x, wqkv, wproj = x.astype(cdt), wqkv.astype(cdt), wproj.astype(cdt)
    xt = _to_ncb(x, tile)
    grid = (xt.shape[-1] // tile,)
    w_specs = [
        _fixed_spec(wqkv.shape), _fixed_spec((1, bqkv.shape[-1])),
        _fixed_spec(wproj.shape), _fixed_spec((1, bproj.shape[-1])),
        _fixed_spec(bias_l.shape),
    ]
    in_specs = [_ncb_spec(N, C, tile)] + w_specs
    operands = [xt, wqkv, bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1), bias_l]
    out_shape = jax.ShapeDtypeStruct((N, C, xt.shape[-1]), out_dtype)
    out_specs = _ncb_spec(N, C, tile)
    if seed is not None:
        in_specs = [_wblock_seed_spec()] + in_specs
        operands = [seed] + operands
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((H, N, N, xt.shape[-1]), jnp.bfloat16))
        out_specs = (out_specs, _mask_spec(H, N, tile))
    outs = pl.pallas_call(
        functools.partial(_wblock_fwd_kernel, H, float(rate) if seed is not None else 0.0),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=not _on_tpu(),  # dropout callers gate on the TPU PRNG
    )(*operands)
    if seed is not None:
        y_t, mask = outs
        y = y_t.transpose(2, 0, 1)[:B]
        return (y, mask) if want_mask else y
    return outs.transpose(2, 0, 1)[:B]


def _wblock_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask=None, rate=0.0):
    B, N, C = x.shape
    H = bias_l.shape[0]
    if not wblock_fits(N, C):
        return _wblock_ph_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy,
                                   mask=mask, rate=rate)
    tile = _block_tile(N, C, B)
    cdt = _wblock_compute_dtype(C, x.dtype)
    out_dtype = x.dtype
    x, wqkv, wproj, dy = (a.astype(cdt) for a in (x, wqkv, wproj, dy))
    xt = _to_ncb(x, tile)
    dyt = _to_ncb(dy, tile)
    grid = (xt.shape[-1] // tile,)
    w_specs = [
        _fixed_spec(wqkv.shape), _fixed_spec((1, bqkv.shape[-1])),
        _fixed_spec(wproj.shape), _fixed_spec((1, bproj.shape[-1])),
        _fixed_spec(bias_l.shape),
    ]
    in_specs = [_ncb_spec(N, C, tile)] + w_specs + [_ncb_spec(N, C, tile)]
    operands = [xt, wqkv, bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1), bias_l, dyt]
    if mask is not None:
        in_specs = in_specs + [_mask_spec(H, N, tile)]
        operands = operands + [mask]
    out_shape = (
        jax.ShapeDtypeStruct((N, C, xt.shape[-1]), out_dtype),        # dx
        jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),                 # dwqkv
        jax.ShapeDtypeStruct((1, bqkv.shape[-1]), jnp.float32),        # dbqkv
        jax.ShapeDtypeStruct(wproj.shape, jnp.float32),                # dwproj
        jax.ShapeDtypeStruct((1, bproj.shape[-1]), jnp.float32),       # dbproj
        jax.ShapeDtypeStruct(bias_l.shape, jnp.float32),               # dbias
    )
    out_specs = (
        _ncb_spec(N, C, tile),
        _fixed_spec(wqkv.shape), _fixed_spec((1, bqkv.shape[-1])),
        _fixed_spec(wproj.shape), _fixed_spec((1, bproj.shape[-1])),
        _fixed_spec(bias_l.shape),
    )
    dx_t, dwqkv, dbqkv, dwproj, dbproj, dbias = pl.pallas_call(
        functools.partial(_wblock_bwd_kernel, H, float(rate) if mask is not None else 0.0),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=not _on_tpu(),
    )(*operands)
    dx = dx_t.transpose(2, 0, 1)[:B]
    return dx, dwqkv, dbqkv.reshape(-1), dwproj, dbproj.reshape(-1), dbias


@jax.custom_vjp
def fused_window_block(x, wqkv, bqkv, wproj, bproj, bias_l):
    """proj(softmax((x Wq)(x Wk)^T + bias) (x Wv)) over tiny windows, fully
    fused fwd+bwd — q scaling pre-folded into wqkv/bqkv by the caller.

    x: [B_, N, C]; wqkv: [C, 3C]; bqkv: [3C]; wproj: [C, C]; bproj: [C];
    bias_l: [H, N, N, 128] lane-periodic (nW | 128, callers check).
    Returns [B_, N, C] in x's dtype.
    """
    return _wblock_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l)


def _wblock_fwd_rule(x, wqkv, bqkv, wproj, bproj, bias_l):
    y = _wblock_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l)
    return y, (x, wqkv, bqkv, wproj, bproj, bias_l)


def _wblock_bwd_rule(res, dy):
    return _wblock_bwd_impl(*res, dy)


fused_window_block.defvjp(_wblock_fwd_rule, _wblock_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_window_block_dropout(x, wqkv, bqkv, wproj, bproj, bias_l, seed, rate):
    """fused_window_block with in-kernel attention dropout (TPU-only: the
    hardware PRNG has no interpreter support). The forward STORES the
    keep-mask as a VJP residual and the backward consumes it — do NOT switch
    back to reseed-regeneration to save HBM: it proved unreliable in this
    larger kernel (see _wblock_fwd_kernel) and silently corrupts gradients."""
    return _wblock_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, seed=seed, rate=rate)


def _wblock_fwd_rule_d(x, wqkv, bqkv, wproj, bproj, bias_l, seed, rate):
    y, mask = _wblock_fwd_impl(
        x, wqkv, bqkv, wproj, bproj, bias_l, seed=seed, rate=rate, want_mask=True
    )
    return y, (x, wqkv, bqkv, wproj, bproj, bias_l, mask)


def _wblock_bwd_rule_d(rate, res, dy):
    x, wqkv, bqkv, wproj, bproj, bias_l, mask = res
    return _wblock_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask=mask, rate=rate) + (None,)


fused_window_block_dropout.defvjp(_wblock_fwd_rule_d, _wblock_bwd_rule_d)


@functools.lru_cache(maxsize=None)
def _sharded_wblock_op(mesh, rate, with_dropout):
    """shard_map wrap of the whole-block kernel over the ``data`` axis:
    windows shard, weights/bias replicate, weight gradients psum."""
    data, repl = P("data"), P()
    mask_sharded = P(None, None, None, "data")  # window-batch on the LAST axis

    def _local_seed(seed):
        return seed + jax.lax.axis_index("data").astype(jnp.int32) * 1000003

    if with_dropout:
        fwd_specs = (data, repl, repl, repl, repl, repl, repl)

        def fwd_body(x, wqkv, bqkv, wproj, bproj, bias_l, seed):
            return _wblock_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l,
                                    seed=_local_seed(seed), rate=rate, want_mask=True)

        def bwd_body(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask):
            dx, *dws = _wblock_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy,
                                        mask=mask, rate=rate)
            return (dx, *jax.lax.psum(tuple(dws), "data"))

        fwd_sm = jax.shard_map(fwd_body, mesh=mesh, in_specs=fwd_specs,
                               out_specs=(data, mask_sharded), check_vma=False)
        bwd_sm = jax.shard_map(bwd_body, mesh=mesh,
                               in_specs=fwd_specs[:6] + (data, mask_sharded),
                               out_specs=(data, repl, repl, repl, repl, repl),
                               check_vma=False)

        @jax.custom_vjp
        def op(x, wqkv, bqkv, wproj, bproj, bias_l, seed):
            y, _ = fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, seed)
            return y

        def op_fwd(x, wqkv, bqkv, wproj, bproj, bias_l, seed):
            y, mask = fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, seed)
            return y, (x, wqkv, bqkv, wproj, bproj, bias_l, mask)

        def op_bwd(res, dy):
            x, wqkv, bqkv, wproj, bproj, bias_l, mask = res
            outs = bwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask)
            return tuple(outs) + (None,)

        op.defvjp(op_fwd, op_bwd)
        return op

    fwd_specs = (data, repl, repl, repl, repl, repl)

    def fwd_body(x, wqkv, bqkv, wproj, bproj, bias_l):
        return _wblock_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l)

    def bwd_body(x, wqkv, bqkv, wproj, bproj, bias_l, dy):
        dx, *dws = _wblock_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy)
        return (dx, *jax.lax.psum(tuple(dws), "data"))

    fwd_sm = jax.shard_map(fwd_body, mesh=mesh, in_specs=fwd_specs,
                           out_specs=data, check_vma=False)
    bwd_sm = jax.shard_map(bwd_body, mesh=mesh, in_specs=fwd_specs + (data,),
                           out_specs=(data, repl, repl, repl, repl, repl),
                           check_vma=False)

    @jax.custom_vjp
    def op(x, wqkv, bqkv, wproj, bproj, bias_l):
        return fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l)

    def op_fwd(x, wqkv, bqkv, wproj, bproj, bias_l):
        return (fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l),
                (x, wqkv, bqkv, wproj, bproj, bias_l))

    def op_bwd(res, dy):
        x, wqkv, bqkv, wproj, bproj, bias_l = res
        return tuple(bwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, dy))

    op.defvjp(op_fwd, op_bwd)
    return op


def sharded_window_block(mesh, x, wqkv, bqkv, wproj, bproj, bias_l, seed=None, rate=0.0):
    """fused_window_block under shard_map over the mesh's ``data`` axis."""
    if seed is None:
        return _sharded_wblock_op(mesh, 0.0, False)(x, wqkv, bqkv, wproj, bproj, bias_l)
    return _sharded_wblock_op(mesh, float(rate), True)(x, wqkv, bqkv, wproj, bproj, bias_l, seed)


def _sharded_wblock_tp_op(mesh, rate, with_dropout, head_dim):
    """The PER-HEAD whole-block kernel under shard_map over (``data``,
    ``model``): window-batch shards over ``data``, WHOLE HEADS over ``model``
    — exactly the TP layout parallel/tp.py assigns the qkv/proj/bias params
    ([C, 3, H, hd] on axis 2, proj rows, bias-table heads), so the kernel
    consumes each shard's resident weights with zero resharding.

    Per (data, model) shard: project q/k/v for the LOCAL heads, attention,
    and the output projection's LOCAL head-rows — a partial [B_loc, N, C]
    that one psum over ``model`` completes (row-parallel matmul; bproj is
    added by model-rank 0 only so the sum applies it once). Backward: dx
    psums over ``model``; dwqkv/dbqkv/dwproj/dbias are head-local and psum
    over ``data`` only; dbproj is identical on every model rank (computed
    from the replicated dy) and psums over ``data``.

    Weights arrive UNFUSED ([C, 3, H, hd] / [3, H, hd]) — fusing to
    [C, 3C] outside would interleave heads across the column order and force
    GSPMD to all-gather; each shard fuses its local slice instead."""
    data, repl = P("data"), P()
    xs = P("data")
    wqkv_s = P(None, None, "model", None)
    bqkv_s = P(None, "model", None)
    wproj_s = P("model", None)
    bias_s = P("model")
    mask_s = P("model", None, None, "data")

    def _fuse_local(wqkv, bqkv):
        C = wqkv.shape[0]
        return wqkv.reshape(C, -1), bqkv.reshape(-1)

    def _bp_local(bproj):
        # applied once across the model psum
        return jnp.where(jax.lax.axis_index("model") == 0, bproj, jnp.zeros_like(bproj))

    tp_ways = mesh.shape["model"]

    def _local_seed(seed):
        rank = jax.lax.axis_index("data") * tp_ways + jax.lax.axis_index("model")
        return seed + rank.astype(jnp.int32) * 1000003

    def _unfuse_grads(dwf, dbf, wqkv_shape):
        C, _, H_loc, hd = wqkv_shape
        return dwf.reshape(C, 3, H_loc, hd), dbf.reshape(3, H_loc, hd)

    if with_dropout:
        fwd_specs = (xs, wqkv_s, bqkv_s, wproj_s, repl, bias_s, repl)

        def fwd_body(x, wqkv, bqkv, wproj, bproj, bias_l, seed):
            wf, bf = _fuse_local(wqkv, bqkv)
            y, mask = _wblock_ph_fwd_impl(
                x, wf, bf, wproj, _bp_local(bproj), bias_l,
                seed=_local_seed(seed), rate=rate, want_mask=True, head_dim=head_dim,
            )
            return jax.lax.psum(y, "model"), mask

        def bwd_body(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask):
            wf, bf = _fuse_local(wqkv, bqkv)
            dx, dwf, dbf, dwproj, dbproj, dbias = _wblock_ph_bwd_impl(
                x, wf, bf, wproj, _bp_local(bproj), bias_l, dy,
                mask=mask, rate=rate, head_dim=head_dim,
            )
            dwqkv, dbqkv = _unfuse_grads(dwf, dbf, wqkv.shape)
            dx = jax.lax.psum(dx, "model")
            dws = jax.lax.psum((dwqkv, dbqkv, dwproj, dbproj, dbias), "data")
            return (dx, *dws)

        fwd_sm = jax.shard_map(fwd_body, mesh=mesh, in_specs=fwd_specs,
                               out_specs=(xs, mask_s), check_vma=False)
        bwd_sm = jax.shard_map(bwd_body, mesh=mesh,
                               in_specs=fwd_specs[:6] + (xs, mask_s),
                               out_specs=(xs, wqkv_s, bqkv_s, wproj_s, repl, bias_s),
                               check_vma=False)

        @jax.custom_vjp
        def op(x, wqkv, bqkv, wproj, bproj, bias_l, seed):
            y, _ = fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, seed)
            return y

        def op_fwd(x, wqkv, bqkv, wproj, bproj, bias_l, seed):
            y, mask = fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, seed)
            return y, (x, wqkv, bqkv, wproj, bproj, bias_l, mask)

        def op_bwd(res, dy):
            x, wqkv, bqkv, wproj, bproj, bias_l, mask = res
            outs = bwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, dy, mask)
            return tuple(outs) + (None,)

        op.defvjp(op_fwd, op_bwd)
        return op

    fwd_specs = (xs, wqkv_s, bqkv_s, wproj_s, repl, bias_s)

    def fwd_body(x, wqkv, bqkv, wproj, bproj, bias_l):
        wf, bf = _fuse_local(wqkv, bqkv)
        y = _wblock_ph_fwd_impl(x, wf, bf, wproj, _bp_local(bproj), bias_l,
                                head_dim=head_dim)
        return jax.lax.psum(y, "model")

    def bwd_body(x, wqkv, bqkv, wproj, bproj, bias_l, dy):
        wf, bf = _fuse_local(wqkv, bqkv)
        dx, dwf, dbf, dwproj, dbproj, dbias = _wblock_ph_bwd_impl(
            x, wf, bf, wproj, _bp_local(bproj), bias_l, dy, head_dim=head_dim,
        )
        dwqkv, dbqkv = _unfuse_grads(dwf, dbf, wqkv.shape)
        dx = jax.lax.psum(dx, "model")
        dws = jax.lax.psum((dwqkv, dbqkv, dwproj, dbproj, dbias), "data")
        return (dx, *dws)

    fwd_sm = jax.shard_map(fwd_body, mesh=mesh, in_specs=fwd_specs,
                           out_specs=xs, check_vma=False)
    bwd_sm = jax.shard_map(bwd_body, mesh=mesh, in_specs=fwd_specs + (xs,),
                           out_specs=(xs, wqkv_s, bqkv_s, wproj_s, repl, bias_s),
                           check_vma=False)

    @jax.custom_vjp
    def op(x, wqkv, bqkv, wproj, bproj, bias_l):
        return fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l)

    def op_fwd(x, wqkv, bqkv, wproj, bproj, bias_l):
        return (fwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l),
                (x, wqkv, bqkv, wproj, bproj, bias_l))

    def op_bwd(res, dy):
        x, wqkv, bqkv, wproj, bproj, bias_l = res
        return tuple(bwd_sm(x, wqkv, bqkv, wproj, bproj, bias_l, dy))

    op.defvjp(op_fwd, op_bwd)
    return op


def sharded_window_block_tp(mesh, x, wqkv, bqkv, wproj, bproj, bias_l, seed=None, rate=0.0):
    """The whole-block kernel over a (data, model) mesh with head-sharded
    weights. wqkv/bqkv arrive UNFUSED: [C, 3, H, hd] / [3, H, hd] (the
    parameter layout parallel/tp.py shards on the head axis)."""
    head_dim = wqkv.shape[-1]
    if seed is None:
        return _sharded_wblock_tp_op(mesh, 0.0, False, head_dim)(
            x, wqkv, bqkv, wproj, bproj, bias_l)
    return _sharded_wblock_tp_op(mesh, float(rate), True, head_dim)(
        x, wqkv, bqkv, wproj, bproj, bias_l, seed)


# ---------------------------------------------------------------------------
# reference formulation (tests + fallback math)
# ---------------------------------------------------------------------------


def _xla_attention(q, k, v, bias_b):
    """Reference math in broadcast form: q/k/v [B, H, N, D], bias_b [B, H, N, N]."""
    scores = (q[:, :, :, None, :] * k[:, :, None, :, :]).sum(-1).astype(jnp.float32) + bias_b
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return (attn[..., None] * v[:, :, None, :, :]).sum(-2)


def expand_bias_lanes(bias, mask, num_lanes=LANE):
    """Build the [H, N, N, num_lanes] lane-periodic bias from the shared
    relative-position bias [H, N, N] and the optional per-window shift mask
    [nW, N, N]. Requires nW | num_lanes. Differentiable in ``bias`` (the
    learned table); the mask is a static constant."""
    H, N, _ = bias.shape
    bias_l = jnp.broadcast_to(bias[..., None].astype(jnp.float32), (H, N, N, num_lanes))
    if mask is not None:
        nW = mask.shape[0]
        m = jnp.tile(jnp.asarray(mask, dtype=jnp.float32), (num_lanes // nW, 1, 1))
        bias_l = bias_l + m.transpose(1, 2, 0)[None]  # [1, N, N, L]
    return bias_l
