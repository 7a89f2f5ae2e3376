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
    """The backward half must equal running that direction's (independent)
    GRU on the reversed sequence (then re-reversed) — true bidirectionality
    with untied per-direction weights (torch nn.GRU semantics)."""
    B, T, C, H = 2, 7, 3, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))

    m = BiGRU(hidden=H, num_layers=1)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (B, 2 * H)

    g = v["params"]["gru0"]
    layer = GRULayer(H)

    def dir_params(d):
        return {"params": {"wi": g["wi"][d], "bi": g["bi"][d], "wh": g["wh"][d], "bh": g["bh"][d]}}

    fwd = layer.apply(dir_params(0), x)
    bwd = layer.apply(dir_params(1), x[:, ::-1])[:, ::-1]
    want = jnp.concatenate([fwd, bwd], axis=-1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    # directions are genuinely untied
    assert not np.allclose(np.asarray(g["wi"][0]), np.asarray(g["wi"][1]))


def test_bigru_matches_torch_bidirectional():
    """Full 2-layer bidirectional stack vs torch.nn.GRU(bidirectional=True),
    weights copied torch->flax the same way the import tool does."""
    B, T, C, H = 3, 6, 5, 4
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, T, C)).astype(np.float32)

    tg = torch.nn.GRU(C, H, 2, batch_first=True, bidirectional=True)
    params = {}
    for layer in range(2):
        in_dim = C if layer == 0 else 2 * H
        wi = np.stack(
            [
                np.asarray(getattr(tg, f"weight_ih_l{layer}").detach()).T,
                np.asarray(getattr(tg, f"weight_ih_l{layer}_reverse").detach()).T,
            ]
        )
        wh = np.stack(
            [
                np.asarray(getattr(tg, f"weight_hh_l{layer}").detach()).T,
                np.asarray(getattr(tg, f"weight_hh_l{layer}_reverse").detach()).T,
            ]
        )
        bi = np.stack(
            [
                np.asarray(getattr(tg, f"bias_ih_l{layer}").detach()),
                np.asarray(getattr(tg, f"bias_ih_l{layer}_reverse").detach()),
            ]
        )
        bh = np.stack(
            [
                np.asarray(getattr(tg, f"bias_hh_l{layer}").detach()),
                np.asarray(getattr(tg, f"bias_hh_l{layer}_reverse").detach()),
            ]
        )
        assert wi.shape == (2, in_dim, 3 * H)
        params[f"gru{layer}"] = {
            "wi": jnp.asarray(wi), "wh": jnp.asarray(wh),
            "bi": jnp.asarray(bi), "bh": jnp.asarray(bh),
        }

    m = BiGRU(hidden=H, num_layers=2)
    out = m.apply({"params": params}, jnp.asarray(x), train=False)

    tout, _ = tg(torch.from_numpy(x))
    want = tout.detach().numpy().mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


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


def test_bigru_inscan_dropout_semantics():
    """Inter-layer dropout is applied INSIDE the producing scan (TPU
    fusion-emitter workaround) but must keep nn.Dropout semantics:
    rng-dependent in train mode, identity in eval, unbiased in expectation."""
    B, T, C, H = 8, 10, 16, 32
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    m = BiGRU(hidden=H, num_layers=2, dropout_ratio=0.5)
    v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)

    eval_out = m.apply(v, x, train=False)
    eval_out2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))

    t1 = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(2)})
    t2 = m.apply(v, x, train=True, rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))

    # expectation over many masks approaches the eval output (GRU layer 2 is
    # nonlinear so only approximately — generous tolerance, tight enough to
    # catch a missing 1/keep rescale, which shifts the scale by 2x)
    outs = np.mean(
        [np.asarray(m.apply(v, x, train=True, rngs={"dropout": jax.random.key(k)}))
         for k in range(4, 68)], axis=0)
    scale = np.abs(np.asarray(eval_out)).mean()
    assert np.abs(outs - np.asarray(eval_out)).mean() < 0.35 * scale
