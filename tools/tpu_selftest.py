"""TPU-only self-checks that the CPU-forced pytest suite cannot run.

The test conftest pins JAX to CPU (the virtual 8-device mesh), so kernels
that need real hardware — Mosaic-compiled forward/backward and the
in-kernel-dropout PRNG — have no CI coverage. Run this directly on the TPU
host:

    PYTHONPATH=. python tools/tpu_selftest.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend}, need a TPU")
        return 0

    from focal_tpu.ops.pallas_kernels import (
        _xla_attention,
        fused_window_attention,
        fused_window_attention_dropout,
    )

    rng = np.random.default_rng(0)
    B, H, N, D = 512, 4, 9, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32)) for _ in range(3))
    bias_l = jnp.asarray(rng.normal(size=(H, N, N, 128)).astype(np.float32))
    lanes = np.arange(B) % 128
    bias_b = jnp.asarray(np.asarray(bias_l).transpose(3, 0, 1, 2)[lanes])

    # 1. fused kernel vs XLA reference on hardware
    got = fused_window_attention(q, k, v, bias_l)
    want = _xla_attention(q, k, v, bias_b)
    err = float(jnp.abs(got - want).max())
    assert err < 1e-4, f"fused forward mismatch on TPU: {err}"
    print(f"fused forward parity on TPU: max err {err:.2e}")

    # 2. fused BACKWARD kernel vs the XLA VJP on hardware (dq/dk/dv/dbias,
    # including the in-kernel lane reduction of the bias gradient)
    def loss_fused(q, k, v, bias_l):
        return jnp.sum(jnp.sin(fused_window_attention(q, k, v, bias_l)))

    def loss_xla(q, k, v, bias_l):
        bb = bias_l.transpose(3, 0, 1, 2)[jnp.asarray(lanes)]
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, bb)))

    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(q, k, v, bias_l)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3)))(q, k, v, bias_l)
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), g1, g2):
        e = float(jnp.abs(a - b).max())
        assert e < 1e-3, f"fused backward {name} mismatch on TPU: {e}"
        print(f"fused backward parity ({name}): max err {e:.2e}")

    # 3. dropout kernel: seeds differ, mean is unbiased, grads finite
    rate = 0.2

    def drop(seed, r):
        return fused_window_attention_dropout(q, k, v, bias_l, jnp.full((1,), seed, jnp.int32), r)

    outs = [np.asarray(drop(s, rate)) for s in range(6)]
    assert not np.allclose(outs[0], outs[1]), "dropout seeds produce identical outputs"
    mean_err = np.abs(np.mean(outs, axis=0) - np.asarray(want)).mean()
    scale = np.abs(np.asarray(want)).mean()
    assert mean_err < scale * 0.5, f"dropout mean deviates from no-dropout: {mean_err} vs {scale}"
    print(f"dropout kernel: seed-variation OK, mean deviation {mean_err / scale:.3f}x of scale")

    g = jax.grad(
        lambda *a: jnp.sum(drop(7, rate)), argnums=(0,)
    )(q)
    assert np.isfinite(np.asarray(g[0])).all(), "non-finite dropout grads"
    print("dropout kernel gradients: finite")

    # 4. rate->0 limit: forward AND backward converge to the no-dropout
    # kernel (exercises the backward's PRNG mask regeneration)
    almost = drop(1, 1e-7)
    err0 = float(jnp.abs(almost - got).max())
    assert err0 < 1e-3, f"rate->0 forward limit mismatch: {err0}"

    g_almost = jax.grad(
        lambda q, k, v, b: jnp.sum(jnp.sin(
            fused_window_attention_dropout(q, k, v, b, jnp.full((1,), 1, jnp.int32), 1e-7)
        )),
        argnums=(0, 1, 2, 3),
    )(q, k, v, bias_l)
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), g_almost, g1):
        e = float(jnp.abs(a - b).max())
        assert e < 1e-3, f"rate->0 backward limit mismatch ({name}): {e}"
    print(f"rate->0 limit parity (fwd+bwd): max fwd err {err0:.2e}")

    # 4b. dropout mask agreement between forward and backward at D=64 — the
    # stage-2 Swin shape where fwd and bwd used to pick different lane tiles
    # (512 vs 256) and regenerate DIFFERENT masks (round-2 ADVICE high).
    # With a fixed seed the op is deterministic, so the autodiff directional
    # derivative must match central finite differences; a mask mismatch in
    # the backward breaks this immediately at rate=0.2.
    B2, H2, N2, D2 = 512, 4, 9, 64
    q2, k2, v2 = (
        jnp.asarray(rng.normal(size=(B2, H2, N2, D2)).astype(np.float32)) for _ in range(3)
    )
    bias_l2 = jnp.asarray(rng.normal(size=(H2, N2, N2, 128)).astype(np.float32))
    seed2 = jnp.full((1,), 11, jnp.int32)

    def f64(qq):
        return jnp.sum(
            jnp.sin(fused_window_attention_dropout(qq, k2, v2, bias_l2, seed2, 0.2))
        )

    u = jnp.asarray(rng.normal(size=q2.shape).astype(np.float32))
    u = u / jnp.linalg.norm(u)
    gq = jax.jit(jax.grad(f64))(q2)
    directional = float(jnp.vdot(gq, u))
    eps = 1e-2
    fd = float((f64(q2 + eps * u) - f64(q2 - eps * u)) / (2 * eps))
    rel = abs(directional - fd) / (abs(fd) + 1e-9)
    assert rel < 5e-2, (
        f"dropout bwd mask disagrees with fwd at D=64: grad.u={directional} fd={fd}"
    )
    print(f"dropout fwd/bwd mask agreement at D=64 (finite diff): rel err {rel:.3e}")

    # 5. opt-in fused MLP: hardware fwd/bwd parity and the dropout variant's
    # mask regeneration (rate->0 limit + seed variation)
    from focal_tpu.ops.pallas_kernels import fused_mlp, fused_mlp_dropout

    x = jnp.asarray(rng.normal(size=(1500, 64)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(256,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)

    def mlp_ref(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return h @ w2 + b2

    got = fused_mlp(x, w1, b1, w2, b2)
    want = mlp_ref(x, w1, b1, w2, b2)
    # Mosaic lowers in-kernel f32 dots as single-pass bf16 on the MXU
    # (~1e-3 abs at these magnitudes); the production path feeds bf16 anyway
    e = float(jnp.abs(got - want).max())
    assert e < 5e-3, f"fused MLP forward mismatch on TPU: {e}"
    g1 = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(fused_mlp(*a))), argnums=(0, 1, 2, 3, 4)))(
        x, w1, b1, w2, b2
    )
    g2 = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(mlp_ref(*a))), argnums=(0, 1, 2, 3, 4)))(
        x, w1, b1, w2, b2
    )
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), g1, g2):
        e = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert e < 2e-2, f"fused MLP backward {name} mismatch on TPU: {e}"
    print("fused MLP fwd+bwd parity on TPU: OK")

    s1 = jnp.full((1,), 5, jnp.int32)
    d1 = fused_mlp_dropout(x, w1, b1, w2, b2, s1, 0.3)
    d2 = fused_mlp_dropout(x, w1, b1, w2, b2, jnp.full((1,), 6, jnp.int32), 0.3)
    assert not np.allclose(np.asarray(d1), np.asarray(d2)), "MLP dropout seeds identical"
    almost = fused_mlp_dropout(x, w1, b1, w2, b2, s1, 1e-7)
    e = float(jnp.abs(almost - got).max())
    assert e < 5e-3, f"MLP dropout rate->0 limit mismatch: {e}"
    ga = jax.jit(jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_mlp_dropout(*a, s1, 1e-7))), argnums=(0, 1, 2, 3, 4)
    ))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), ga, g1):
        e = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert e < 1e-2, f"MLP dropout rate->0 backward mismatch ({name}): {e}"
    print("fused MLP dropout: seed variation + rate->0 fwd/bwd limits OK")

    print("TPU selftest: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
