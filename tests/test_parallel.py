"""Data-parallel mesh: sharded train steps on the 8-device virtual CPU mesh.

Checks the property that matters: a DP-sharded step computes the SAME update
as the single-device step (global-batch gradients; XLA inserts the psums)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from focal_tpu.models import build_backbone
from focal_tpu.ops import build_augmenter
from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated
from focal_tpu.train.losses import make_focal_loss
from focal_tpu.train.optim import build_optimizer
from focal_tpu.train.state import init_state
from focal_tpu.train.steps import make_pretrain_step, make_supervised_train_step


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from focal_tpu.params.cli import build_parser
    from focal_tpu.params.auto import set_auto_params

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-batch_size", "32"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path_factory.mktemp("par"))
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
    tx, _ = build_optimizer(args, state.params, steps_per_epoch=2, epochs_override=2)
    state = state.replace(tx=tx, opt_state=tx.init(state.params))
    return args, model, augmenter, data, state


def test_mesh_plan_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual mesh
    plan = make_mesh_plan(8)
    assert plan.num_devices == 8
    assert make_mesh_plan(1) is None
    with pytest.raises(ValueError):
        make_mesh_plan(16)


def test_dp_pretrain_step_matches_single_device(setup):
    args, model, augmenter, data, state = setup
    focal = make_focal_loss(args)
    idx = jnp.arange(32, dtype=jnp.int32)
    rng = jax.random.key(7)

    # SGD: updates are linear in the gradient, so single-vs-multi device
    # parity is measurable. (One Adam step from zero moments is ~ lr*sign(g)
    # and flips on reduction-order fp noise for near-zero grads.)
    sgd = optax.sgd(0.01)
    state = state.replace(tx=sgd, opt_state=sgd.init(state.params))

    # the steps donate their input state: give each its own copy
    state_a = jax.tree_util.tree_map(jnp.copy, state)
    state_b = jax.tree_util.tree_map(jnp.copy, state)

    # single device
    step1 = make_pretrain_step(model, augmenter, focal, None)
    s1, m1 = step1(state_a, data, idx, rng)

    # 8-way DP
    plan = make_mesh_plan(8)
    step8 = make_pretrain_step(model, augmenter, focal, plan)
    state8 = put_replicated(state_b, plan)
    data8 = put_replicated(data, plan)
    idx8 = jax.device_put(idx, plan.batch_sharded)
    s8, m8 = step8(state8, data8, idx8, rng)

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    # updated parameters (= params - lr * global grads) agree across the mesh
    for (p1, a), (p8, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1.params)[0],
        jax.tree_util.tree_flatten_with_path(s8.params)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_dp_batched_eval_runs_and_matches(setup):
    """The scanned eval forward must produce identical outputs on and off the
    mesh (and carries a batch-sharding constraint inside)."""
    from focal_tpu.train import evaluate as ev

    args, model, augmenter, data, state = setup
    idx_matrix = jnp.arange(64, dtype=jnp.int32).reshape(2, 32)

    fwd1 = ev.make_batched_forward(model, augmenter, "class", None)
    out1 = fwd1(state, data, idx_matrix)

    plan = make_mesh_plan(8)
    fwd8 = ev.make_batched_forward(model, augmenter, "class", plan)
    out8 = fwd8(
        put_replicated(state, plan), put_replicated(data, plan), put_replicated(idx_matrix, plan)
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8), rtol=1e-4, atol=1e-5)


def test_dp_supervised_step_runs(setup):
    args, model, augmenter, data, state = setup
    labels = jnp.asarray(np.arange(64) % 7, jnp.int32)
    plan = make_mesh_plan(4)
    step = make_supervised_train_step(model, augmenter, plan)
    state4 = put_replicated(jax.tree_util.tree_map(jnp.copy, state), plan)
    out_state, metrics = step(
        state4, put_replicated(data, plan), put_replicated(labels, plan),
        jax.device_put(jnp.arange(32, dtype=jnp.int32), plan.batch_sharded), jax.random.key(0)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_dp_sw_transformer_pretrain_step_matches_single_device(tmp_path):
    """8-way DP parity for the SECOND backbone: the Swin stack's windows /
    shifts / masks must shard over the batch axis without changing the math
    (loss + SGD-updated params vs the single-device step)."""
    from focal_tpu.params.cli import build_parser
    from focal_tpu.params.auto import set_auto_params

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "SW_Transformer", "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-batch_size", "32"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path)
    args = set_auto_params(args)

    model = build_backbone(args)
    augmenter = build_augmenter(args)
    rng_np = np.random.default_rng(0)
    data = {
        "shake": {
            "seismic": jnp.asarray(rng_np.normal(size=(64, 1, 10, 20)).astype(np.float32)),
            "audio": jnp.asarray(rng_np.normal(size=(64, 1, 10, 96)).astype(np.float32)),
        }
    }
    sample = jax.jit(augmenter.no)(jax.tree_util.tree_map(lambda a: a[:2], data))
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    sgd = optax.sgd(0.01)
    state = state.replace(tx=sgd, opt_state=sgd.init(state.params))
    focal = make_focal_loss(args)
    idx = jnp.arange(32, dtype=jnp.int32)
    rng = jax.random.key(7)

    state_a = jax.tree_util.tree_map(jnp.copy, state)
    state_b = jax.tree_util.tree_map(jnp.copy, state)

    step1 = make_pretrain_step(model, augmenter, focal, None)
    s1, m1 = step1(state_a, data, idx, rng)

    plan = make_mesh_plan(8)
    step8 = make_pretrain_step(model, augmenter, focal, plan)
    s8, m8 = step8(put_replicated(state_b, plan), put_replicated(data, plan),
                   jax.device_put(idx, plan.batch_sharded), rng)

    assert np.isclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    # rtol 3e-3: the 8-way gradient psum reorders f32 reductions; with the
    # deeper Swin stack one-in-thousands elements land ~1.5e-3 relative off
    for (p1, a), (p8, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1.params)[0],
        jax.tree_util.tree_flatten_with_path(s8.params)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-5)
