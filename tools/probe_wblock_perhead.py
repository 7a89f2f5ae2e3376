"""Hardware compile+parity probe for the per-head whole-block kernel at
MOD_WIDE stage geometries (VERDICT round-4 item 2 follow-up).

BENCH_r05 prep found the round-4 per-head backward does NOT compile on
hardware at C=512 (scoped-VMEM 17.58M > 16M) even though
wblock_perhead_fits() predicted 7.1 MB — the estimate missed Mosaic's
temporaries and double buffering. This probe compiles and checks each wide
geometry in isolation (seconds per case instead of a full bench run) so the
fits formula can be calibrated against reality.

Usage: python tools/probe_wblock_perhead.py [--cases C512,C1024] [--dropout]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from focal_tpu.ops import pallas_kernels as pk

# (label, B_windows, N, C, H) — stage geometries of MOD_WIDE SW_Transformer
# (configs/MOD_WIDE.yaml: dims 256/512/1024, window 3x3 -> N=9)
CASES = {
    "C256": (512, 9, 256, 2),
    "C512": (512, 9, 512, 4),
    "C1024": (512, 9, 1024, 8),
    # hd=64 variants (the geometry round 4's selftest covered)
    "C512h8": (512, 9, 512, 8),
    "C1024h16": (512, 9, 1024, 16),
}


def run_case(label, B, N, C, H, dropout=False):
    hd = C // H
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(size=(3 * C,)).astype(np.float32) * 0.01)
    wproj = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.02, jnp.bfloat16)
    bproj = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32) * 0.1)
    bias_l = pk.expand_bias_lanes(bias, None)

    print(f"[{label}] N={N} C={C} H={H} hd={hd} "
          f"fits={pk.wblock_perhead_fits(N, C, H)}", flush=True)

    if dropout:
        seed = jnp.asarray([7], jnp.int32)

        def f(x, wqkv, bqkv, wproj, bproj, bias_l):
            y = pk.fused_window_block_dropout(x, wqkv, bqkv, wproj, bproj, bias_l,
                                              seed, 0.1)
            return (y.astype(jnp.float32) ** 2).sum()
    else:

        def f(x, wqkv, bqkv, wproj, bproj, bias_l):
            y = pk.fused_window_block(x, wqkv, bqkv, wproj, bproj, bias_l)
            return (y.astype(jnp.float32) ** 2).sum()

    grad = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4, 5)))
    try:
        outs = grad(x, wqkv, bqkv, wproj, bproj, bias_l)
        jax.block_until_ready(outs)
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"[{label}] COMPILE/RUN FAILED: {msg}", flush=True)
        return False

    if dropout:
        print(f"[{label}] compiled + ran (dropout path; no XLA oracle)", flush=True)
        return True

    # parity oracle: plain XLA math on the same operands. The bias is the
    # lane-periodic [H, N, N, 128] pattern: window-batch item b reads lane
    # b % 128 (same congruence the kernel's _expand_bias applies), so the
    # bias gradient folds item contributions onto their lanes.
    def ref(x, wqkv, bqkv, wproj, bproj, bias_l):
        xf = x.astype(jnp.float32)
        qkv = xf @ wqkv.astype(jnp.float32) + bqkv
        q = qkv[..., :C].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        k = qkv[..., C:2 * C].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        v = qkv[..., 2 * C:].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        lane = jnp.arange(B) % 128
        bias_b = jnp.take(bias_l, lane, axis=3).transpose(3, 0, 1, 2)  # [B,H,N,N]
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) + bias_b
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        y = o @ wproj.astype(jnp.float32) + bproj
        return (y ** 2).sum()

    ref_outs = jax.jit(jax.grad(ref, argnums=(0, 1, 2, 3, 4, 5)))(
        x, wqkv, bqkv, wproj, bproj, bias_l)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    ok = True
    for name, a, b in zip(names, outs, ref_outs):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        scale = float(jnp.abs(b32).max()) or 1.0
        err = float(jnp.abs(a32 - b32).max()) / scale
        flag = "ok" if err < 3e-2 else "MISMATCH"
        if err >= 3e-2:
            ok = False
        print(f"[{label}]   {name}: rel err {err:.2e} {flag}", flush=True)
    return ok


# TP-shard geometries: one model shard's view of the kernel — H_local heads
# with hd = C/H_global, so the local qkv is [C, 3*H_local*hd] and the proj
# rows [H_local*hd, C] (C_attn < C). (label, B, N, C, H_local, hd); covers
# 2-way shards of MOD_WIDE stages and of the reference dims (hd 16/32 —
# full-axis trailing blocks, hardware-unvalidated before round 5).
TP_CASES = {
    "TPshard_C256_h2_hd64": (512, 9, 256, 2, 64),
    "TPshard_C512_h2_hd128": (512, 9, 512, 2, 128),
    "TPshard_C1024_h4_hd128": (512, 9, 1024, 4, 128),
    "TPshard_C64_h2_hd16": (512, 9, 64, 2, 16),
    "TPshard_C128_h2_hd32": (512, 9, 128, 2, 32),
}


def run_tp_case(label, B, N, C, H, hd):
    """Forward+backward parity of the per-head impl at a TP-shard geometry
    (explicit head_dim, C_attn = H*hd < C), against plain XLA math."""
    rng = np.random.default_rng(0)
    Ca = H * hd
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * Ca)).astype(np.float32) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(size=(3 * Ca,)).astype(np.float32) * 0.01)
    wproj = jnp.asarray(rng.normal(size=(Ca, C)).astype(np.float32) * 0.02, jnp.bfloat16)
    bproj = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32) * 0.1)
    bias_l = pk.expand_bias_lanes(bias, None)
    print(f"[{label}] N={N} C={C} H_local={H} hd={hd}", flush=True)

    try:
        y = pk._wblock_ph_fwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, head_dim=hd)
        dy = (2.0 * y.astype(jnp.float32)).astype(x.dtype)
        grads = pk._wblock_ph_bwd_impl(x, wqkv, bqkv, wproj, bproj, bias_l, dy,
                                       head_dim=hd)
        jax.block_until_ready(grads)
    except Exception as e:
        print(f"[{label}] COMPILE/RUN FAILED: {str(e).splitlines()[0][:300]}", flush=True)
        return False

    def ref(x, wqkv, bqkv, wproj, bproj, bias_l):
        xf = x.astype(jnp.float32)
        qkv = xf @ wqkv.astype(jnp.float32) + bqkv  # [B, N, 3*Ca]
        q = qkv[..., :Ca].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        k = qkv[..., Ca:2 * Ca].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        v = qkv[..., 2 * Ca:].reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        lane = jnp.arange(B) % 128
        bias_b = jnp.take(bias_l, lane, axis=3).transpose(3, 0, 1, 2)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) + bias_b
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, Ca)
        y = o @ wproj.astype(jnp.float32) + bproj
        return (y ** 2).sum()

    ref_grads = jax.jit(jax.grad(ref, argnums=(0, 1, 2, 3, 4, 5)))(
        x, wqkv, bqkv, wproj, bproj, bias_l)
    names = ["dx", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    ok = True
    for name, a, b in zip(names, grads, ref_grads):
        a32, b32 = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        scale = float(jnp.abs(b32).max()) or 1.0
        err = float(jnp.abs(a32 - b32).max()) / scale
        flag = "ok" if err < 3e-2 else "MISMATCH"
        if err >= 3e-2:
            ok = False
        print(f"[{label}]   {name}: rel err {err:.2e} {flag}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=",".join(CASES))
    ap.add_argument("--tp_cases", default="")
    ap.add_argument("--dropout", action="store_true")
    a = ap.parse_args()
    results = {}
    for label in filter(None, a.cases.split(",")):
        B, N, C, H = CASES[label]
        results[label] = run_case(label, B, N, C, H, dropout=a.dropout)
    tp_list = list(TP_CASES) if a.tp_cases == "all" else filter(None, a.tp_cases.split(","))
    for label in tp_list:
        B, N, C, H, hd = TP_CASES[label]
        results[label] = run_tp_case(label, B, N, C, H, hd)
    print(results)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
