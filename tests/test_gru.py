"""GRU layer: gate-math parity with torch.nn.GRU and bidirectional wiring
(reference: src/models/RecurrentModule.py:5-31)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from focal_tpu.models.layers import BiGRU, GRULayer


def test_gru_matches_torch():
    B, T, C, H = 3, 5, 4, 6
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, C)).astype(np.float32)

    m = GRULayer(H)
    v = m.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))

    tg = torch.nn.GRU(C, H, 1, batch_first=True)
    with torch.no_grad():
        tg.weight_ih_l0.copy_(torch.from_numpy(np.asarray(v["params"]["wi"]).T.copy()))
        tg.weight_hh_l0.copy_(torch.from_numpy(np.asarray(v["params"]["wh"]).T.copy()))
        tg.bias_ih_l0.zero_()
        tg.bias_hh_l0.zero_()
    tout, _ = tg(torch.from_numpy(x))
    np.testing.assert_allclose(out, tout.detach().numpy(), atol=1e-5)


def test_bigru_direction_wiring():
    """The backward half must equal running the forward GRU on the reversed
    sequence (then re-reversed) — i.e. true bidirectionality."""
    B, T, C, H = 2, 7, 3, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))

    m = BiGRU(hidden=H, num_layers=1)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (B, 2 * H)

    layer = GRULayer(H)
    lv = {"params": v["params"]["gru0"]}
    fwd = layer.apply(lv, x)
    bwd = layer.apply(lv, x[:, ::-1])[:, ::-1]
    want = jnp.concatenate([fwd, bwd], axis=-1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_bigru_order_sensitivity():
    """A GRU must be order-sensitive (unlike the mean-pooled conv features)."""
    B, T, C, H = 2, 6, 3, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    m = BiGRU(hidden=H, num_layers=2)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    a = m.apply(v, x, train=False)
    b = m.apply(v, x[:, jnp.asarray([3, 1, 5, 0, 4, 2])], train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
