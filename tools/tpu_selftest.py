"""TPU-only self-checks that the CPU-forced pytest suite cannot run.

The test conftest pins JAX to CPU (the virtual 8-device mesh), so kernels
that need real hardware — the in-kernel-dropout window attention's PRNG —
have no CI coverage. Run this directly on the TPU host:

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
    bias = jnp.asarray(rng.normal(size=(B, H, N, N)).astype(np.float32))

    # 1. fused kernel vs XLA reference on hardware
    got = fused_window_attention(q, k, v, bias)
    want = _xla_attention(q, k, v, bias)
    err = float(jnp.abs(got - want).max())
    assert err < 1e-4, f"fused forward mismatch on TPU: {err}"
    print(f"fused forward parity on TPU: max err {err:.2e}")

    # 2. dropout kernel: seeds differ, mean is unbiased, grads finite
    rate = 0.2
    outs = [np.asarray(fused_window_attention_dropout(q, k, v, bias, jnp.int32(s), rate)) for s in range(6)]
    assert not np.allclose(outs[0], outs[1]), "dropout seeds produce identical outputs"
    mean_err = np.abs(np.mean(outs, axis=0) - np.asarray(want)).mean()
    scale = np.abs(np.asarray(want)).mean()
    assert mean_err < scale * 0.5, f"dropout mean deviates from no-dropout: {mean_err} vs {scale}"
    print(f"dropout kernel: seed-variation OK, mean deviation {mean_err / scale:.3f}x of scale")

    g = jax.grad(
        lambda *a: jnp.sum(fused_window_attention_dropout(*a, jnp.int32(7), rate)), argnums=(0, 1, 2, 3)
    )(q, k, v, bias)
    assert all(np.isfinite(np.asarray(x)).all() for x in g), "non-finite dropout grads"
    print("dropout kernel gradients: finite")

    # 3. near-zero rate converges to the no-dropout kernel
    almost = fused_window_attention_dropout(q, k, v, bias, jnp.int32(1), 1e-7)
    err0 = float(jnp.abs(almost - got).max())
    assert err0 < 1e-3, f"rate->0 limit mismatch: {err0}"
    print(f"rate->0 limit parity: max err {err0:.2e}")

    print("TPU selftest: ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
