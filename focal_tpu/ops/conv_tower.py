"""Fused DeepSense conv-tower kernels (train-mode forward + backward).

Reference behavior reproduced: src/models/ConvModules.py:54-218 — a chain of
ConvLayer2D blocks (conv2d(1,KW) SAME -> BatchNorm(train stats) -> exact
GELU -> Dropout2d), the first without and the rest with a residual add.

Why a kernel chain: the XLA lowering runs three HBM passes per layer over
the [B, I, S, C] activation (conv fusion, BN reduce, and the
residual+normalize+GELU+dropout elementwise chain). Here each layer is ONE
pallas pass per direction: the apply of layer k (BN+GELU+dropout+residual)
computes layer k+1's convolution and batch-stat sums in the same VMEM
visit, so every activation makes a single HBM round trip. Batch statistics
are global, so they are accumulated across row tiles into [2, C] outputs
(revisited blocks) and finalized between calls in XLA ([C]-sized math).

Mosaic-driven layout (what hardware actually compiles): everything is 2D.
Activations are [R*S, C] (rows = sample-interval x spectrum position,
lanes = channels) and the grid tiles whole samples (TRS = TR_r * S rows).
The (1, KW) SAME convolution builds its im2col operand by lane-concatenating
KW `pltpu.roll`-shifted copies of the block — rolled full blocks all carry
offset-0 layouts, so the concat is legal (column *slices* are not: Mosaic
rejects tpu.concatenate with mismatched sublane offsets), and rows rolled
across sample boundaries are zeroed with an iota mask, which is exactly the
conv's zero padding because tiles hold whole samples. One
[TRS, KW*Cin] x [KW*Cin, Cout] MXU dot per layer then does the conv at true
conv FLOPs. Two further Mosaic limits shape the code: rotates exist only
for 32-bit data (bf16 blocks are rolled through an exact f32 round-trip),
and BN coefficients arrive as separate [1, C] inputs rather than rows
sliced out of a packed [4, C] array (offset-0 broadcasts only).

Dropout2d masks ([B, C], broadcast over space — torch Dropout2d semantics)
are generated OUTSIDE with the module's rng and passed as per-sample [R, C]
scale factors; kernels expand them to rows with an iota-built expansion
matrix dot, keeping the kernels deterministic and interpreter-testable.

BatchNorm numerics match flax (stats in f32 on the storage-rounded conv
output, fast variance E[x^2]-E[x]^2 clipped at 0, eps 1e-5); the biased
batch variance is returned for the caller's running-average update.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from focal_tpu.ops.pallas_kernels import _gelu_exact, _gelu_grad, _on_tpu

BN_EPS = 1e-5


def _pick_trr(R, S, C, dtype, kw_max=5):
    """Samples-per-tile TR_r: largest power of two such that R % TR_r == 0,
    the row tile TRS = TR_r*S is sublane-aligned, and the working set
    (~(8 + KW) [TRS, C-padded] f32 buffers — im2col parts are built in f32)
    stays within ~8 MB of VMEM. None when no tile exists (caller falls
    back to the XLA path)."""
    pad_c = ((C + 127) // 128) * 128
    sub = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
    budget = 8 * 1024 * 1024
    tr = 256
    while tr >= 1:
        trs = tr * S
        if R % tr == 0 and trs % sub == 0 and trs * pad_c * 4 * (8 + kw_max) <= budget:
            return tr
        tr //= 2
    return None


def tower_fits(R, S, C, dtype, kw_max=5):
    """Whether the fused path supports this geometry. kw_max must be the
    widest kernel that actually runs IN-kernel (external-c0 towers exclude
    layer 0's conv — it runs in XLA), matching _tower_op's tile pick."""
    return _pick_trr(R, S, C, dtype, kw_max=kw_max) is not None


# ---------------------------------------------------------------------------
# in-kernel math helpers (all 2D, offset-0 layouts only)
# ---------------------------------------------------------------------------


def _roll_rows(x, shift, interp):
    """Circular row shift with offset-0 output. Mosaic has no rotate for
    non-32-bit data, so bf16 goes through an exact f32 round-trip."""
    shift = shift % x.shape[0]
    if shift == 0:
        return x
    if interp:
        return jnp.roll(x, shift, axis=0)
    if x.dtype == jnp.bfloat16:
        return pltpu.roll(x.astype(jnp.float32), shift, 0).astype(jnp.bfloat16)
    return pltpu.roll(x, shift, 0)


def _valid_rows(TRS, S, delta, dtype):
    """[TRS, 1] 0/1 factor: row r (spectrum position s = r % S) has a valid
    tap partner at s + delta. Zeroing the rest IS the SAME zero padding."""
    s = jax.lax.broadcasted_iota(jnp.int32, (TRS, 1), 0) % S
    return ((s + delta >= 0) & (s + delta < S)).astype(dtype)


def _im2col(x, S, kw, lo, interp, transpose=False):
    """[TRS, C] -> [TRS, KW*C]: lane-concat of rolled+masked tap views.
    transpose=False: part k holds x[s + (k-lo)] (forward conv).
    transpose=True:  part k holds x[s - (k-lo)] (transposed conv)."""
    TRS = x.shape[0]
    parts = []
    for k in range(kw):
        d = k - lo
        if transpose:
            part = _roll_rows(x, d, interp) * _valid_rows(TRS, S, -d, x.dtype)
        else:
            part = _roll_rows(x, -d, interp) * _valid_rows(TRS, S, d, x.dtype)
        parts.append(part)
    return jnp.concatenate(parts, axis=1) if kw > 1 else parts[0]


def _expand_mask(m, S, TRS):
    """[TR_r, C] per-sample mask -> [TRS, C] per-row, via an iota-built
    expansion-matrix dot (row i of E selects sample i // S)."""
    TRr = m.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (TRS, TRr), 0) // S
    col = jax.lax.broadcasted_iota(jnp.int32, (TRS, TRr), 1)
    E = (row == col).astype(jnp.float32)
    return jnp.dot(E, m.astype(jnp.float32), preferred_element_type=jnp.float32)


def _row_sums2(c):
    cf = c.astype(jnp.float32)
    return jnp.concatenate(
        [jnp.sum(cf, axis=0, keepdims=True), jnp.sum(cf * cf, axis=0, keepdims=True)]
    )


def _accum(ref, val):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ref[...] = val

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        ref[...] = ref[...] + val


def _bwd_pre(da, c, mask_e, a_ref, b_ref, p_ref, q_ref):
    """Shared backward prologue: gy (grad at the BN output) and xhat.
    BN rows: A = invstd*scale, B = bias - mu*invstd*scale (y = c*A + B),
    P = invstd, Q = mu*invstd (xhat = c*P - Q)."""
    cf = c.astype(jnp.float32)
    y = cf * a_ref[...] + b_ref[...]
    xhat = cf * p_ref[...] - q_ref[...]
    gz = da.astype(jnp.float32) * mask_e
    gy = gz * _gelu_grad(y)
    return gy, xhat


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _conv0_kernel(S, kw, interp, x_ref, w_ref, b_ref, c_ref, sums_ref):
    """Standalone first conv (internal-c0 towers): x -> c0 + stat sums."""
    lo = (kw - 1) // 2
    xcat = _im2col(x_ref[...], S, kw, lo, interp)
    c = jnp.dot(xcat, w_ref[...], preferred_element_type=jnp.float32)
    c = c + b_ref[...]
    cst = c.astype(c_ref.dtype)
    c_ref[...] = cst
    _accum(sums_ref, _row_sums2(cst))


def _apply_kernel(S, kw_next, has_next, residual, interp, *refs):
    """Apply layer k (BN + GELU + Dropout2d [+ residual]) and, when
    has_next, compute layer k+1's conv + stat sums in the same pass."""
    it = iter(refs)
    c_ref = next(it)
    a_row = next(it)   # [1, C] invstd*scale
    b_row = next(it)   # [1, C] bias - mu*invstd*scale
    mask_ref = next(it)
    aprev_ref = next(it) if residual else None
    if has_next:
        wn_ref, bn_ref = next(it), next(it)
    a_ref = next(it)
    if has_next:
        cn_ref, sums_ref = next(it), next(it)
    TRS = c_ref.shape[0]
    cf = c_ref[...].astype(jnp.float32)
    y = cf * a_row[...] + b_row[...]
    z = _gelu_exact(y) * _expand_mask(mask_ref[...], S, TRS)
    if residual:
        z = z + aprev_ref[...].astype(jnp.float32)
    a = z.astype(a_ref.dtype)
    a_ref[...] = a
    if has_next:
        lo = (kw_next - 1) // 2
        xcat = _im2col(a, S, kw_next, lo, interp)
        c = jnp.dot(xcat, wn_ref[...], preferred_element_type=jnp.float32)
        c = c + bn_ref[...]
        cst = c.astype(cn_ref.dtype)
        cn_ref[...] = cst
        _accum(sums_ref, _row_sums2(cst))


def _bwd_stats_kernel(S, da_ref, c_ref, mask_ref, a_row, b_row, p_row, q_row,
                      s4_ref):
    """Accumulate (sum dxhat, sum dxhat*xhat, dscale, dbias) over tiles.
    dxhat differs from dscale's gy*xhat only by the scale factor, applied
    when finalizing outside (scale is a [C] row there)."""
    TRS = c_ref.shape[0]
    mask_e = _expand_mask(mask_ref[...], S, TRS)
    gy, xhat = _bwd_pre(da_ref[...], c_ref[...], mask_e, a_row, b_row, p_row, q_row)
    s4 = jnp.concatenate([
        jnp.sum(gy, axis=0, keepdims=True),
        jnp.sum(gy * xhat, axis=0, keepdims=True),
        jnp.sum(gy * xhat, axis=0, keepdims=True),  # dscale
        jnp.sum(gy, axis=0, keepdims=True),          # dbias
    ])
    _accum(s4_ref, s4)


def _bn_dc(gy, xhat, p_row, sc_row, m0_row, m1_row):
    """BN train-mode input gradient. m0/m1: [1, C] = (mean dxhat,
    mean dxhat*xhat) over the global batch."""
    dxhat = gy * sc_row[...]
    return p_row[...] * (dxhat - m0_row[...] - xhat * m1_row[...])


def _bwd_apply_kernel(S, kw, residual, interp, da_ref, c_ref, mask_ref,
                      a_row, b_row, p_row, q_row, sc_row, m0_row, m1_row,
                      aprev_ref, wt_ref, dprev_ref, dw_ref, db_ref):
    """dc via the BN backward, then da_prev = [da +] convT(dc, W), plus
    in-kernel dW/db accumulation. wt: [KW*Cout, Cin] per-tap transposed
    weights (tap order as stored; the transposed conv's tap reversal is in
    the roll direction)."""
    TRS = c_ref.shape[0]
    mask_e = _expand_mask(mask_ref[...], S, TRS)
    gy, xhat = _bwd_pre(da_ref[...], c_ref[...], mask_e, a_row, b_row, p_row, q_row)
    dc = _bn_dc(gy, xhat, p_row, sc_row, m0_row, m1_row)
    dcs = dc.astype(da_ref.dtype)
    lo = (kw - 1) // 2
    dcat = _im2col(dcs, S, kw, lo, interp, transpose=True)
    dprev = jnp.dot(dcat, wt_ref[...], preferred_element_type=jnp.float32)
    if residual:
        dprev = dprev + da_ref[...].astype(jnp.float32)
    dprev_ref[...] = dprev.astype(dprev_ref.dtype)
    # dW[k*Cin+ci, co] = sum_rows im2col(aprev)[row, k*Cin+ci] * dc[row, co]
    acat = _im2col(aprev_ref[...], S, kw, lo, interp)
    dw = jax.lax.dot_general(
        acat, dcs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    _accum(dw_ref, dw)
    _accum(db_ref, jnp.sum(dc, axis=0, keepdims=True))


def _bwd_dc_kernel(S, da_ref, c_ref, mask_ref, a_row, b_row, p_row, q_row,
                   sc_row, m0_row, m1_row, dc_ref):
    """dc only — for the external-c0 tower's first layer, whose conv lives
    outside the fused chain (its VJP is handled by XLA)."""
    TRS = c_ref.shape[0]
    mask_e = _expand_mask(mask_ref[...], S, TRS)
    gy, xhat = _bwd_pre(da_ref[...], c_ref[...], mask_e, a_row, b_row, p_row, q_row)
    dc = _bn_dc(gy, xhat, p_row, sc_row, m0_row, m1_row)
    dc_ref[...] = dc.astype(dc_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _rows_spec(TRS, C):
    return pl.BlockSpec((TRS, C), lambda t: (t, 0), memory_space=pltpu.VMEM)


def _fix_spec(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda t: (0,) * n, memory_space=pltpu.VMEM)


def _interp():
    return not _on_tpu()


def _conv0_call(x2, w, b, kw, cout, S, TRS, store_dtype, interp):
    RS, cin = x2.shape
    return pl.pallas_call(
        functools.partial(_conv0_kernel, S, kw, interp),
        grid=(RS // TRS,),
        in_specs=[_rows_spec(TRS, cin), _fix_spec(w.shape), _fix_spec((1, cout))],
        out_specs=(_rows_spec(TRS, cout), _fix_spec((2, cout))),
        out_shape=(
            jax.ShapeDtypeStruct((RS, cout), store_dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ),
        interpret=interp,
    )(x2, w, b.reshape(1, -1))


def _apply_call(c, rows, mask, aprev, nxt, kw_next, cout_next, residual,
                S, TRS, TRr, store_dtype, interp):
    """rows: (A, B) [1, C] BN-affine rows; nxt: (w_next, b_next) or None;
    aprev required iff residual."""
    RS, C = c.shape
    has_next = nxt is not None
    in_specs = [_rows_spec(TRS, C), _fix_spec((1, C)), _fix_spec((1, C)),
                pl.BlockSpec((TRr, C), lambda t: (t, 0), memory_space=pltpu.VMEM)]
    operands = [c, rows[0], rows[1], mask]
    if residual:
        in_specs.append(_rows_spec(TRS, C))
        operands.append(aprev)
    if has_next:
        w, b = nxt
        in_specs += [_fix_spec(w.shape), _fix_spec((1, cout_next))]
        operands += [w, b.reshape(1, -1)]
        out_specs = (_rows_spec(TRS, C), _rows_spec(TRS, cout_next),
                     _fix_spec((2, cout_next)))
        out_shape = (
            jax.ShapeDtypeStruct((RS, C), store_dtype),
            jax.ShapeDtypeStruct((RS, cout_next), store_dtype),
            jax.ShapeDtypeStruct((2, cout_next), jnp.float32),
        )
    else:
        out_specs = _rows_spec(TRS, C)
        out_shape = jax.ShapeDtypeStruct((RS, C), store_dtype)
    outs = pl.pallas_call(
        functools.partial(_apply_kernel, S, kw_next if has_next else 0,
                          has_next, residual, interp),
        grid=(RS // TRS,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interp,
    )(*operands)
    return outs if has_next else (outs, None, None)


def _bwd_rows_specs(TRS, TRr, C):
    return [
        _rows_spec(TRS, C), _rows_spec(TRS, C),
        pl.BlockSpec((TRr, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
        _fix_spec((1, C)), _fix_spec((1, C)), _fix_spec((1, C)), _fix_spec((1, C)),
    ]


def _bwd_stats_call(da, c, mask, rows, S, TRS, TRr):
    RS, C = c.shape
    return pl.pallas_call(
        functools.partial(_bwd_stats_kernel, S),
        grid=(RS // TRS,),
        in_specs=_bwd_rows_specs(TRS, TRr, C),
        out_specs=_fix_spec((4, C)),
        out_shape=jax.ShapeDtypeStruct((4, C), jnp.float32),
        interpret=_interp(),
    )(da, c, mask, rows[0], rows[1], rows[2], rows[3])


def _bwd_apply_call(da, c, mask, rows, m2rows, aprev, wt, kw, cin, residual,
                    S, TRS, TRr, store_dtype):
    RS, C = c.shape
    in_specs = _bwd_rows_specs(TRS, TRr, C) + [
        _fix_spec((1, C)), _fix_spec((1, C)), _fix_spec((1, C)),
        _rows_spec(TRS, cin), _fix_spec(wt.shape),
    ]
    return pl.pallas_call(
        functools.partial(_bwd_apply_kernel, S, kw, residual, _interp()),
        grid=(RS // TRS,),
        in_specs=in_specs,
        out_specs=(_rows_spec(TRS, cin), _fix_spec((kw * cin, C)),
                   _fix_spec((1, C))),
        out_shape=(
            jax.ShapeDtypeStruct((RS, cin), store_dtype),
            jax.ShapeDtypeStruct((kw * cin, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=_interp(),
    )(da, c, mask, rows[0], rows[1], rows[2], rows[3],
      rows[4], m2rows[0], m2rows[1], aprev, wt)


def _bwd_dc_call(da, c, mask, rows, m2rows, S, TRS, TRr, store_dtype):
    RS, C = c.shape
    in_specs = _bwd_rows_specs(TRS, TRr, C) + [
        _fix_spec((1, C)), _fix_spec((1, C)), _fix_spec((1, C)),
    ]
    return pl.pallas_call(
        functools.partial(_bwd_dc_kernel, S),
        grid=(RS // TRS,),
        in_specs=in_specs,
        out_specs=_rows_spec(TRS, C),
        out_shape=jax.ShapeDtypeStruct((RS, C), store_dtype),
        interpret=_interp(),
    )(da, c, mask, rows[0], rows[1], rows[2], rows[3],
      rows[4], m2rows[0], m2rows[1])


# ---------------------------------------------------------------------------
# the tower op (one custom VJP over the whole chain)
# ---------------------------------------------------------------------------


def _finalize_stats(sums, n, scale, bias):
    """sums [2, C] -> BN coefficient rows + (mu, var). Fast variance with
    the non-negativity clip (flax._compute_stats semantics). Rows are the
    separate [1, C] inputs the kernels broadcast (Mosaic: offset-0 only):
    (A = invstd*scale, B = bias - mu*A, P = invstd, Q = mu*invstd,
    SC = scale)."""
    mu = sums[0] / n
    var = jnp.maximum(sums[1] / n - mu * mu, 0.0)
    invstd = jax.lax.rsqrt(var + BN_EPS)
    sc = scale.astype(jnp.float32)
    a_row = invstd * sc
    rows = (
        a_row[None, :],
        (bias.astype(jnp.float32) - mu * a_row)[None, :],
        invstd[None, :],
        (mu * invstd)[None, :],
        sc[None, :],
    )
    return rows, mu, var


def _transpose_w(w, kw, cin, cout):
    """[KW*Cin, Cout] -> [KW*Cout, Cin]: per-tap transpose, tap order kept
    (the transposed conv's tap reversal lives in the roll direction)."""
    return w.reshape(kw, cin, cout).transpose(0, 2, 1).reshape(kw * cout, cin)


@functools.lru_cache(maxsize=None)
def _tower_op(cfg_key, R, S, store_dtype_name, external_c0):
    """cfg_key: tuple of (kw, cin, cout, residual) per layer. When
    external_c0, layer 0's conv runs OUTSIDE (x0 is its output c0) and
    ws[0]/bs[0] are ignored placeholders with zero gradients."""
    cfgs = cfg_key
    L = len(cfgs)
    store_dtype = jnp.dtype(store_dtype_name)
    n = float(R * S)
    # external-c0 towers never run layer 0's conv in-kernel: its (possibly
    # huge, e.g. 80-tap) width must not shrink the VMEM row tile
    kw_max = max(c[0] for k, c in enumerate(cfgs) if not (external_c0 and k == 0))
    TRr = _pick_trr(R, S, max(c[2] for c in cfgs), store_dtype, kw_max=kw_max)
    assert TRr is not None, "caller must gate on tower_fits()"
    TRS = TRr * S
    interp = _interp()

    def fwd_impl(x0, ws, bs, scales, biases, masks):
        x2 = x0.reshape(R * S, x0.shape[-1])
        if external_c0:
            c = x2
            cf = c.astype(jnp.float32)
            sums = jnp.stack([cf.sum(axis=0), (cf * cf).sum(axis=0)])
        else:
            kw0, _, cout0, _ = cfgs[0]
            c, sums = _conv0_call(x2, ws[0], bs[0], kw0, cout0, S, TRS,
                                  store_dtype, interp)
        a = None
        a_list, c_list, rows_list, mus, vars_ = [], [], [], [], []
        for k in range(L):
            kw, cin, cout, residual = cfgs[k]
            rows, mu, var = _finalize_stats(sums, n, scales[k], biases[k])
            nxt = (ws[k + 1], bs[k + 1]) if k + 1 < L else None
            kw_n, cout_n = (cfgs[k + 1][0], cfgs[k + 1][2]) if k + 1 < L else (0, 0)
            aprev = a if k > 0 else x2
            a, c_next, sums_next = _apply_call(
                c, rows, masks[k], aprev if residual else None, nxt,
                kw_n, cout_n, residual, S, TRS, TRr, store_dtype, interp)
            a_list.append(a)
            c_list.append(c)
            rows_list.append(rows)
            mus.append(mu)
            vars_.append(var)
            c, sums = c_next, sums_next
        res = (x2, tuple(a_list), tuple(c_list), tuple(rows_list))
        aL = a_list[-1].reshape(R, S, cfgs[-1][2])
        return aL, tuple(mus), tuple(vars_), res

    @jax.custom_vjp
    def op(x0, ws, bs, scales, biases, masks):
        aL, mus, vars_, _ = fwd_impl(x0, ws, bs, scales, biases, masks)
        return aL, mus, vars_

    def op_fwd(x0, ws, bs, scales, biases, masks):
        aL, mus, vars_, res = fwd_impl(x0, ws, bs, scales, biases, masks)
        return (aL, mus, vars_), (res, ws, masks)

    def op_bwd(saved, cts):
        (x2, a_list, c_list, rows_list), ws, masks = saved
        da = cts[0].reshape(R * S, cfgs[-1][2])  # stat outputs: stop-gradient
        dws, dbs, dscales, dbiases = [None] * L, [None] * L, [None] * L, [None] * L
        dx0 = None
        for k in range(L - 1, -1, -1):
            kw, cin, cout, residual = cfgs[k]
            rows = rows_list[k]
            s4 = _bwd_stats_call(da, c_list[k], masks[k], rows, S, TRS, TRr)
            m2rows = ((s4[0:1] * rows[4]) / n, (s4[1:2] * rows[4]) / n)
            dscales[k] = s4[2]
            dbiases[k] = s4[3]
            if k == 0 and external_c0:
                dx0 = _bwd_dc_call(da, c_list[0], masks[0], rows, m2rows,
                                   S, TRS, TRr, store_dtype)
                dws[0] = jnp.zeros_like(ws[0])
                dbs[0] = jnp.zeros((cout,), jnp.float32)
                break
            aprev = a_list[k - 1] if k > 0 else x2
            wt = _transpose_w(ws[k].astype(store_dtype), kw, cin, cout)
            dprev, dw, db = _bwd_apply_call(
                da, c_list[k], masks[k], rows, m2rows, aprev, wt,
                kw, cin, residual, S, TRS, TRr, store_dtype)
            dws[k] = dw
            dbs[k] = db.reshape(-1)
            if k > 0:
                da = dprev
            else:
                dx0 = dprev
        dmasks = tuple(jnp.zeros_like(m) for m in masks)
        dx0 = dx0.reshape(R, S, dx0.shape[-1])
        return (dx0, tuple(dws), tuple(dbs), tuple(dscales), tuple(dbiases),
                dmasks)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_conv_tower(x0, layer_cfgs, ws, bs, scales, biases, masks,
                     external_c0=False):
    """Run the fused ConvLayer2D chain in train mode.

    x0: [R, S, Cin] input rows (R = batch * intervals) — or, when
        external_c0, the first conv's output [R, S, C] computed in XLA
        (audio's strided (1, 80) input conv has good MXU shape there).
    layer_cfgs: tuple of (kw, cin, cout, residual) per layer.
    ws[k]: [KW*Cin, Cout] im2col weights (reshaped flax HWIO kernels), in
        the compute dtype; bs/scales/biases: [C] f32; masks[k]: [R, C]
        per-sample dropout scale factors (0 or 1/(1-rate)).

    Returns (a_last [R, S, C], mus, vars) — per-layer batch statistics for
    the caller's running-average update (biased variance, flax semantics).
    """
    cfg_key = tuple(tuple(int(v) for v in c) for c in layer_cfgs)
    op = _tower_op(cfg_key, int(x0.shape[0]), int(x0.shape[1]),
                   str(jnp.dtype(x0.dtype)), bool(external_c0))
    return op(x0, tuple(ws), tuple(bs), tuple(scales), tuple(biases),
              tuple(masks))
