"""Tensor parallelism (model mesh axis): a DP x TP step must compute the
SAME update as the single-device step — the shardings are layout, not math
(GSPMD inserts the collectives). Runs on the 8-device virtual CPU mesh.

The reference has no parallelism at all (src/params/params_util.py:20-55);
this is TPU-native framework surface beyond it (parallel/tp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from focal_tpu.models import build_backbone
from focal_tpu.ops import build_augmenter
from focal_tpu.parallel import tp
from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated
from focal_tpu.train.losses import make_focal_loss
from focal_tpu.train.optim import build_optimizer
from focal_tpu.train.state import init_state
from focal_tpu.train.steps import make_pretrain_step, make_supervised_train_step


def _setup(tmp_path, model_name):
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.params.cli import build_parser

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", model_name, "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-batch_size", "32"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path)
    args = set_auto_params(args)

    model = build_backbone(args)
    augmenter = build_augmenter(args)
    rng = np.random.default_rng(0)
    data = {
        "shake": {
            "seismic": jnp.asarray(rng.normal(size=(64, 1, 10, 20)).astype(np.float32)),
            "audio": jnp.asarray(rng.normal(size=(64, 1, 10, 96)).astype(np.float32)),
        }
    }
    sample = jax.jit(augmenter.no)(jax.tree_util.tree_map(lambda a: a[:2], data))
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    # SGD: updates are linear in gradients, so cross-layout parity is testable
    sgd = optax.sgd(0.01)
    state = state.replace(tx=sgd, opt_state=sgd.init(state.params))
    return args, model, augmenter, data, state


def test_mesh_plan_2d():
    plan = make_mesh_plan(4, 2)
    assert plan.dp == 4 and plan.mp == 2 and plan.num_devices == 8
    assert plan.mesh.axis_names == ("data", "model")
    # auto dp fills the remaining devices
    plan = make_mesh_plan(0, 2)
    assert plan.dp == 4 and plan.mp == 2
    with pytest.raises(ValueError):
        make_mesh_plan(0, 3)  # does not divide 8
    with pytest.raises(ValueError):
        make_mesh_plan(8, 2)  # 16 > 8 devices


def test_rules_shard_and_fall_back():
    # a dividing dim shards, a non-dividing one falls back to replication
    assert tp.leaf_spec("params/stage0_x/block0/mlp/Dense_0/kernel", (16, 32), 2) == \
        jax.sharding.PartitionSpec(None, "model")
    assert tp.leaf_spec("params/stage0_x/block0/mlp/Dense_1/kernel", (32, 16), 2) == \
        jax.sharding.PartitionSpec("model", None)
    assert tp.leaf_spec("params/stage0_x/block0/mlp/Dense_0/kernel", (16, 31), 2) == \
        jax.sharding.PartitionSpec()
    # attention shards by whole heads (round 4): qkv kernel is head-aligned
    # [C, 3, H, hd], proj is row-parallel, rel-pos table shards per head
    assert tp.leaf_spec("params/stage0_x/block0/attn/qkv/kernel", (16, 3, 4, 4), 2) == \
        jax.sharding.PartitionSpec(None, None, "model", None)
    assert tp.leaf_spec("params/stage0_x/block0/attn/qkv/bias", (3, 4, 4), 2) == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert tp.leaf_spec("params/stage0_x/block0/attn/proj/kernel", (16, 16), 2) == \
        jax.sharding.PartitionSpec("model", None)
    assert tp.leaf_spec(
        "params/stage0_x/block0/attn/relative_position_bias_table", (25, 4), 2
    ) == jax.sharding.PartitionSpec(None, "model")
    # odd head counts fall back to replication
    assert tp.leaf_spec("params/stage0_x/block0/attn/qkv/kernel", (16, 3, 3, 4), 2) == \
        jax.sharding.PartitionSpec()


def test_attention_leaves_shard(tmp_path):
    """With the head-aligned layout, >0 ATTENTION leaves must actually carry
    a model axis on a real SW_Transformer state (VERDICT round-3 item 4)."""
    args, model, augmenter, data, state = _setup(tmp_path, "SW_Transformer")
    plan = make_mesh_plan(4, 2)
    sh = tp.state_shardings(state, plan)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    attn_sharded = [
        tp._path_str(p) for p, s in flat
        if "/attn/" in tp._path_str(p)
        and any(ax == "model" for ax in s.spec)
    ]
    assert len(attn_sharded) > 0, "no attention leaves sharded"
    # qkv kernels specifically
    assert any(p.endswith("qkv/kernel") for p in attn_sharded)


@pytest.mark.parametrize("model_name", ["DeepSense", "SW_Transformer"])
def test_tp_pretrain_step_matches_single_device(tmp_path, model_name):
    args, model, augmenter, data, state = _setup(tmp_path, model_name)
    focal = make_focal_loss(args)
    idx = jnp.arange(32, dtype=jnp.int32)
    rng = jax.random.key(7)

    state_a = jax.tree_util.tree_map(jnp.copy, state)
    state_b = jax.tree_util.tree_map(jnp.copy, state)

    step1 = make_pretrain_step(model, augmenter, focal, None)
    s1, m1 = step1(state_a, data, idx, rng)

    plan = make_mesh_plan(4, 2)
    sh = tp.state_shardings(state_b, plan)
    assert tp.sharded_leaf_count(state_b, plan) > 0, "TP rules matched nothing"
    state8 = jax.device_put(state_b, sh)
    step8 = make_pretrain_step(model, augmenter, focal, plan, state_shardings=sh)
    s8, m8 = step8(state8, put_replicated(data, plan),
                   jax.device_put(idx, plan.batch_sharded), rng)

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    # rtol 3e-3 as in the DP SW parity test: psums + TP collectives reorder
    # f32 reductions; rare elements land ~2e-3 relative off on the Swin stack
    for (p1, a), (p8, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1.params)[0],
        jax.tree_util.tree_flatten_with_path(s8.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-5,
            err_msg=tp._path_str(p1),
        )
    # the updated state keeps its model-axis layout (no silent re-replication)
    flat_sh = {tp._path_str(p): s for p, s in jax.tree_util.tree_flatten_with_path(
        tp.state_shardings(s8, plan))[0]}
    flat_after = jax.tree_util.tree_flatten_with_path(s8.params)[0]
    def norm(spec):  # JAX strips trailing Nones: P('model', None) == P('model',)
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    n_model = 0
    for p, leaf in flat_after:
        want = flat_sh["params/" + tp._path_str(p)].spec
        if any(ax == "model" for ax in want):
            assert norm(leaf.sharding.spec) == norm(want), tp._path_str(p)
            n_model += 1
    assert n_model > 0


def test_tp_supervised_step_and_eval(tmp_path):
    args, model, augmenter, data, state = _setup(tmp_path, "DeepSense")
    labels = jnp.asarray(np.arange(64) % 7, jnp.int32)
    idx = jnp.arange(32, dtype=jnp.int32)
    rng = jax.random.key(3)

    state_a = jax.tree_util.tree_map(jnp.copy, state)
    state_b = jax.tree_util.tree_map(jnp.copy, state)

    step1 = make_supervised_train_step(model, augmenter, None)
    s1, m1 = step1(state_a, data, labels, idx, rng)

    plan = make_mesh_plan(2, 4)
    sh = tp.state_shardings(state_b, plan)
    stateT = jax.device_put(state_b, sh)
    stepT = make_supervised_train_step(model, augmenter, plan, state_shardings=sh)
    sT, mT = stepT(stateT, put_replicated(data, plan), put_replicated(labels, plan),
                   jax.device_put(idx, plan.batch_sharded), rng)
    assert np.isclose(float(m1["loss"]), float(mT["loss"]), rtol=1e-4)

    from focal_tpu.train import evaluate as ev

    idx_matrix = jnp.arange(64, dtype=jnp.int32).reshape(2, 32)
    fwd1 = ev.make_batched_forward(model, augmenter, "class", None)
    out1 = fwd1(s1, data, idx_matrix)
    fwdT = ev.make_batched_forward(model, augmenter, "class", plan, state_shardings=sh)
    outT = fwdT(sT, put_replicated(data, plan), put_replicated(idx_matrix, plan))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(outT), rtol=1e-4, atol=1e-5)


def test_tp_gathered_accum_matches_single_device(tmp_path):
    """grad_accum's GradCache two-pass under dp x tp must reproduce the
    single-device gathered update (round-5 support matrix: TP x grad_accum)."""
    from focal_tpu.train.steps import make_pretrain_epoch_fn

    args, model, augmenter, data, state = _setup(tmp_path, "DeepSense")
    focal = make_focal_loss(args)
    seq_len = args.dataset_config["seq_len"]
    subseq_idx = np.arange(64).reshape(-1, seq_len)  # 16 subsequences
    rng = jax.random.key(5)
    kw = dict(n_items=16, batch_size=32, subseq_idx=subseq_idx,
              grad_accum=2, accum_gather=True)

    state_a = jax.tree_util.tree_map(jnp.copy, state)
    fn1 = make_pretrain_epoch_fn(model, augmenter, focal, mesh_plan=None, **kw)
    s1, loss1 = fn1(state_a, data, rng)

    plan = make_mesh_plan(4, 2)
    sh = tp.state_shardings(state, plan)
    state_b = jax.device_put(jax.tree_util.tree_map(jnp.copy, state), sh)
    fnT = make_pretrain_epoch_fn(model, augmenter, focal, mesh_plan=plan,
                                 state_shardings=sh, **kw)
    sT, lossT = fnT(state_b, put_replicated(data, plan), rng)

    assert np.isclose(float(loss1), float(lossT), rtol=1e-4)
    for (p1, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1.params)[0],
        jax.tree_util.tree_flatten_with_path(sT.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-5,
            err_msg=tp._path_str(p1),
        )


class TestTPWholeBlockKernel:
    """The per-head whole-block pallas kernel under the (data, model) mesh
    (ops.pallas_kernels.sharded_window_block_tp): value and every gradient
    must match the plain XLA WindowAttention, and the TP module must actually
    take the kernel route (not the XLA fallback)."""

    def _modules(self, C, H, plan):
        from focal_tpu.models.swin import WindowAttention

        kw = dict(dim=C, window_size=(3, 3), num_heads=H)
        plain = WindowAttention(use_pallas=False, **kw)
        tp_mod = WindowAttention(
            use_pallas=True, use_pallas_block=True, pallas_mesh=plan.mesh, **kw
        )
        return plain, tp_mod

    @pytest.mark.parametrize("C,H,nW", [(256, 4, 1), (256, 4, 4), (128, 8, 1)])
    def test_tp_block_matches_xla(self, C, H, nW):
        from focal_tpu.models.swin import shifted_window_mask

        plan = make_mesh_plan(4, 2)
        if plan is None:
            pytest.skip("needs the 8-device virtual mesh")
        mask = shifted_window_mask(6, 6, 3, 3, 1, 1) if nW == 4 else None
        plain, tp_mod = self._modules(C, H, plan)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(128, 9, C)).astype(np.float32))
        v = plain.init({"params": jax.random.key(0)}, x, mask, train=False)

        out_p = plain.apply(v, x, mask, train=False)
        out_t = tp_mod.apply(v, x, mask, train=False)
        # C>=128 computes in bf16 inside the kernel (same as the DP variant)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p), atol=3e-2)

        def loss(m):
            return lambda vv: jnp.sum(jnp.sin(m.apply(vv, x, mask, train=False)))

        gp = jax.grad(loss(plain))(v)
        gt = jax.jit(jax.grad(loss(tp_mod)))(v)
        for (p1, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp)[0],
            jax.tree_util.tree_flatten_with_path(gt)[0],
        ):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
            assert rel < 6e-3, (tp._path_str(p1), rel)
        gx_p = jax.grad(lambda x: jnp.sum(jnp.sin(plain.apply(v, x, mask, train=False))))(x)
        gx_t = jax.grad(lambda x: jnp.sum(jnp.sin(tp_mod.apply(v, x, mask, train=False))))(x)
        rel = float(jnp.abs(gx_p - gx_t).max() / (jnp.abs(gx_p).max() + 1e-9))
        assert rel < 6e-3, rel

    def test_tp_route_is_taken(self, monkeypatch):
        """The (data, model) mesh must dispatch to sharded_window_block_tp —
        guards against the gate silently regressing to the XLA fallback."""
        from focal_tpu.ops import pallas_kernels as pk

        plan = make_mesh_plan(4, 2)
        if plan is None:
            pytest.skip("needs the 8-device virtual mesh")
        calls = []
        real = pk.sharded_window_block_tp
        import focal_tpu.models.swin as swin_mod

        def spy(mesh, *a, **kw):
            calls.append(mesh.shape)
            return real(mesh, *a, **kw)

        monkeypatch.setattr(pk, "sharded_window_block_tp", spy)
        plain, tp_mod = self._modules(256, 4, plan)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(128, 9, 256)).astype(np.float32))
        v = plain.init({"params": jax.random.key(0)}, x, None, train=False)
        tp_mod.apply(v, x, None, train=False)
        assert calls and calls[0]["model"] == 2


@pytest.mark.slow
def test_tp_cli_e2e(tmp_path):
    """Full train.py supervised run under dp2 x tp2 on synthetic data."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["FOCAL_PLATFORM"] = "cpu"  # the site config force-sets the TPU backend
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS", None)
    cmd = [
        sys.executable, os.path.join(repo, "train.py"), "-dataset", "MOD_TINY",
        "-model", "DeepSense",
        "-learn_framework", "no", "-synthetic", "-epochs", "2", "-batch_size", "16",
        "-data_parallel", "2", "-model_parallel", "2",
        "-output_dir", str(tmp_path), "-tag", "tp_e2e",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200, env=env,
                         cwd=str(tmp_path))
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
