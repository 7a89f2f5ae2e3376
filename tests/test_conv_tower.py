"""Fused conv-tower kernel chain vs a plain-XLA replica (interpret mode).

The replica mirrors the exact reference/flax semantics the kernels claim:
conv2d(1,KW) SAME -> BatchNorm train stats (f32, fast variance, eps 1e-5)
-> exact GELU -> Dropout2d mask -> optional residual add.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focal_tpu.ops.conv_tower import BN_EPS, fused_conv_tower, tower_fits


def _replica(x0, cfgs, ws, bs, scales, biases, masks, external_c0):
    """Pure-XLA forward with the same (rounded-storage) semantics."""
    c = None
    a = None
    mus, vars_ = [], []
    for k, (kw, cin, cout, residual) in enumerate(cfgs):
        if k == 0 and external_c0:
            c = x0
        else:
            src = a if k > 0 else x0
            lo = (kw - 1) // 2
            w4 = ws[k].reshape(kw, cin, cout)[None]  # HWIO [1, kw, cin, cout]
            c = jax.lax.conv_general_dilated(
                src[:, None], w4, (1, 1), [(0, 0), (lo, kw - 1 - lo)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, 0] + bs[k][None, None, :]
            c = c.astype(x0.dtype)
        cf = c.astype(jnp.float32)
        mu = cf.mean(axis=(0, 1))
        var = jnp.maximum((cf * cf).mean(axis=(0, 1)) - mu * mu, 0.0)
        xhat = (cf - mu) * jax.lax.rsqrt(var + BN_EPS)
        y = xhat * scales[k] + biases[k]
        z = jax.nn.gelu(y, approximate=False) * masks[k][:, None, :]
        if residual:
            z = z + a.astype(jnp.float32)
        a = z.astype(x0.dtype)
        mus.append(mu)
        vars_.append(var)
    return a, mus, vars_


def _setup(seed, cfgs, R, S, external_c0=False):
    rng = np.random.default_rng(seed)
    cin0 = cfgs[0][2] if external_c0 else cfgs[0][1]
    x0 = jnp.asarray(rng.normal(size=(R, S, cin0)).astype(np.float32))
    ws, bs, scales, biases, masks = [], [], [], [], []
    for kw, cin, cout, _ in cfgs:
        ws.append(jnp.asarray(rng.normal(size=(kw * cin, cout)).astype(np.float32) * 0.2))
        bs.append(jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1))
        scales.append(jnp.asarray(1.0 + 0.1 * rng.normal(size=(cout,)).astype(np.float32)))
        biases.append(jnp.asarray(0.1 * rng.normal(size=(cout,)).astype(np.float32)))
        keep = rng.random((R, cout)) > 0.2
        masks.append(jnp.asarray((keep / 0.8).astype(np.float32)))
    return x0, ws, bs, scales, biases, masks


CFG_SEISMIC = ((3, 2, 32, False), (3, 32, 32, True), (3, 32, 32, True))
CFG_AUDIO = ((5, 2, 32, False), (5, 32, 32, True))  # external c0 case


def _max_rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))


def test_tower_fits_gate():
    assert tower_fits(64, 20, 32, jnp.float32)
    assert not tower_fits(63, 20, 32, jnp.float32)  # rows not tileable


@pytest.mark.parametrize("external", [False, True])
def test_forward_matches_replica(external):
    cfgs = CFG_AUDIO if external else CFG_SEISMIC
    x0, ws, bs, scales, biases, masks = _setup(0, cfgs, 64, 20, external)
    y, mus, vars_ = fused_conv_tower(x0, cfgs, ws, bs, scales, biases, masks,
                                     external_c0=external)
    yr, mur, varr = _replica(x0, cfgs, ws, bs, scales, biases, masks, external)
    assert _max_rel(y, yr) < 1e-5
    for k in range(len(cfgs)):
        assert _max_rel(mus[k], mur[k]) < 1e-5
        assert _max_rel(vars_[k], varr[k]) < 1e-5


@pytest.mark.parametrize("external", [False, True])
def test_grads_match_replica(external):
    cfgs = CFG_AUDIO if external else CFG_SEISMIC
    x0, ws, bs, scales, biases, masks = _setup(1, cfgs, 64, 20, external)

    def loss_fused(x0, ws, bs, scales, biases):
        y, _, _ = fused_conv_tower(x0, cfgs, ws, bs, scales, biases, masks,
                                   external_c0=external)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x0, ws, bs, scales, biases):
        y, _, _ = _replica(x0, cfgs, ws, bs, scales, biases, masks, external)
        return jnp.sum(jnp.sin(y))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x0, tuple(ws), tuple(bs),
                                                       tuple(scales), tuple(biases))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x0, tuple(ws), tuple(bs),
                                                     tuple(scales), tuple(biases))
    names = ["dx0", "dws", "dbs", "dscales", "dbiases"]
    start = 1 if external else 0  # ws[0]/bs[0] are placeholders when external
    assert _max_rel(gf[0], gr[0]) < 2e-5, "dx0"
    for nm, fu, re in zip(names[1:], gf[1:], gr[1:]):
        for k in range(start if nm in ("dws", "dbs") else 0, len(cfgs)):
            # conv biases feed straight into BatchNorm, so their true
            # gradient is exactly zero (a constant shift moves the batch
            # mean identically) — both sides compute only cancellation
            # noise there; compare such near-zero gradients absolutely
            a = np.asarray(fu[k], np.float64)
            b = np.asarray(re[k], np.float64)
            if max(np.abs(a).max(), np.abs(b).max()) < 1e-2:
                assert np.abs(a - b).max() < 1e-2, f"{nm}[{k}] (near-zero)"
            else:
                assert _max_rel(fu[k], re[k]) < 2e-5, f"{nm}[{k}]"


def _tiny_cfg(dropout):
    import copy

    from focal_tpu.params.yaml_utils import load_dataset_config

    cfg = copy.deepcopy(load_dataset_config("MOD_TINY"))
    cfg["DeepSense"]["dropout_ratio"] = dropout
    return cfg


def _mod_batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "shake": {
            "audio": jnp.asarray(rng.normal(size=(b, 2, 10, 96)).astype(np.float32)),
            "seismic": jnp.asarray(rng.normal(size=(b, 2, 10, 20)).astype(np.float32)),
        }
    }


def test_deepsense_fused_path_parity(monkeypatch):
    """DeepSense(use_pallas=True) must be checkpoint-identical to the XLA
    path and (at dropout 0) match its train-mode forward, gradients, and
    batch_stats updates. Audio engages the external-c0 (strided) tower,
    seismic the internal one."""
    import focal_tpu.ops.conv_tower as ct
    from focal_tpu.models.deepsense import DeepSense

    calls = []
    real = ct.fused_conv_tower
    monkeypatch.setattr(ct, "fused_conv_tower", lambda *a, **k: calls.append(1) or real(*a, **k))

    cfg = _tiny_cfg(0.0)
    plain = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    fused = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True, use_pallas=True)
    x = _mod_batch()
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    vp = plain.init(rngs, x, train=False, head="both")
    vf = fused.init(rngs, x, train=False, head="both")
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(vf)
    for a, b in zip(jax.tree_util.tree_leaves(vp), jax.tree_util.tree_leaves(vf)):
        assert a.shape == b.shape and a.dtype == b.dtype

    def run(model, v):
        return model.apply(
            v, x, train=True, head="class",
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
        )

    yp, sp = run(plain, vp)
    calls.clear()
    yf, sf = run(fused, vp)
    assert calls, "fused tower did not engage"
    assert _max_rel(yf, yp) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(sf), jax.tree_util.tree_leaves(sp)):
        assert _max_rel(a, b) < 1e-5

    def loss(model):
        def f(params):
            y, _ = model.apply(
                {**vp, "params": params}, x, train=True, head="class",
                rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(y))
        return f

    gp = jax.grad(loss(plain))(vp["params"])
    gf = jax.grad(loss(fused))(vp["params"])
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    for (kp, a), (_, b) in zip(flat_p, flat_f):
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        if max(np.abs(an).max(), np.abs(bn).max()) < 1e-2:
            # conv biases feeding BN: true gradient is exactly zero
            assert np.abs(an - bn).max() < 1e-2, kp
        else:
            assert _max_rel(b, a) < 5e-4, kp


def test_deepsense_fused_dropout_smoke():
    """With dropout active the fused path draws its own Dropout2d masks;
    check the step runs, stats update, and gradients are finite."""
    from focal_tpu.models.deepsense import DeepSense

    cfg = _tiny_cfg(0.2)
    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True, use_pallas=True)
    x = _mod_batch(seed=3)
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False, head="both")

    def f(params):
        y, st = model.apply(
            {**v, "params": params}, x, train=True, head="class",
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
        )
        return jnp.sum(y**2), st

    (val, st), g = jax.value_and_grad(f, has_aux=True)(v["params"])
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))
    # running stats moved off their init values
    moved = [
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(v["batch_stats"]))
    ]
    assert max(moved) > 1e-4


def test_stats_gradient_coupling():
    """The BN backward must account for the batch-stat dependence on the
    input: for an input that shifts the whole batch, dL/dx through the mean
    subtraction cancels — check against jax's own autodiff of the replica
    on a per-element probe."""
    cfgs = ((3, 4, 16, False), (3, 16, 16, True))
    x0, ws, bs, scales, biases, masks = _setup(2, cfgs, 16, 20, False)

    def f_fused(x0):
        y, _, _ = fused_conv_tower(x0, cfgs, ws, bs, scales, biases, masks)
        return jnp.vdot(y, jnp.ones_like(y))

    def f_ref(x0):
        y, _, _ = _replica(x0, cfgs, ws, bs, scales, biases, masks, False)
        return jnp.vdot(y, jnp.ones_like(y))

    assert _max_rel(jax.grad(f_fused)(x0), jax.grad(f_ref)(x0)) < 2e-5
