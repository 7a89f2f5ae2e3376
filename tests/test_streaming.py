"""Streaming data path (HBM budget; VERDICT round-2 item 3): splits forced
over a tiny budget must train correctly through the real loops — host-side
shuffling, double-buffered block transfers, block-scan train steps, the
streaming KNN-feature forward — on both the supervised and FOCAL pretrain
stages. Throughput (>=80% of device-resident at MOD shapes) is measured on
TPU hardware and recorded in BASELINE.md; these tests cover correctness.

Reference contrast: src/input_utils/multi_modal_dataset.py:40 streams
lazily from disk and has no HBM ceiling; the device-resident fast path here
did (until this module).
"""

import numpy as np
import pytest

# real-loop runs with compiles: excluded from the fast dev loop
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("streaming"))


def _argv(extra):
    return [
        "-dataset", "MOD_TINY", "-synthetic", "-synthetic_samples", "96",
        "-batch_size", "16", "-seed", "3", "-data_parallel", "1",
        "-hbm_budget_gb", "0.000001", "-stream_block_steps", "2",
    ] + extra


def test_streaming_supervised_learns(workdir, make_args):
    from focal_tpu.train.loops import Run, supervised_train

    args = make_args(
        argv=_argv(["-model", "DeepSense", "-learn_framework", "no",
                    "-epochs", "12", "-val_epochs", "4"]),
        output_dir=workdir,
    )
    state, best_val_acc = supervised_train(args)
    assert best_val_acc > 0.6


def test_streaming_pretrain_with_knn(workdir, make_args):
    from focal_tpu.train.loops import pretrain

    args = make_args(
        argv=_argv(["-model", "DeepSense", "-learn_framework", "FOCAL",
                    "-stage", "pretrain", "-epochs", "3", "-val_epochs", "2"]),
        output_dir=workdir,
    )
    state, best_val_loss = pretrain(args)
    assert np.isfinite(best_val_loss)


def test_budget_decision_and_block_schedule(make_args):
    """Unit checks: budget gating and the block partition cover every step."""
    from focal_tpu.data.streaming import StreamingEvalPlan, make_streaming_forward

    class _F:  # stand-in with the .idx contract
        pass

    # wrap-padded eval plan weights mask exactly the duplicated tail rows
    fwd = _F()
    fwd.idx = (np.arange(8) % 5).reshape(2, 4)
    labels = np.arange(5) * 10
    plan = StreamingEvalPlan(labels, fwd)
    assert plan.weight.sum() == 5
    np.testing.assert_array_equal(plan.labels.reshape(-1), (np.arange(8) % 5) * 10)


def test_streaming_matches_device_resident_loss_scale(workdir, make_args):
    """Streaming and device-resident runs shuffle differently (host numpy vs
    on-device jax.random), so trajectories differ — but two epochs over the
    same data must land in the same loss regime (catches dropped/duplicated
    batches, wrong scaling, bad block boundaries)."""
    from focal_tpu.train.loops import supervised_train

    base = ["-model", "DeepSense", "-learn_framework", "no", "-epochs", "4",
            "-val_epochs", "4"]
    args_s = make_args(argv=_argv(base), output_dir=workdir)
    _, acc_s = supervised_train(args_s)
    args_d = make_args(
        argv=[
            "-dataset", "MOD_TINY", "-synthetic", "-synthetic_samples", "96",
            "-batch_size", "16", "-seed", "3", "-data_parallel", "1",
        ] + base,
        output_dir=workdir,
    )
    _, acc_d = supervised_train(args_d)
    assert abs(acc_s - acc_d) < 0.35, (acc_s, acc_d)


def test_streaming_under_tensor_parallelism(workdir, make_args):
    """Streaming composes with TP (round-5 support matrix): the train split
    streams in P(None, 'data') blocks over the 2-D mesh while the state keeps
    its model-axis layout — no silent device-resident degrade."""
    from focal_tpu.parallel import tp
    from focal_tpu.train.loops import Run, pretrain

    args = make_args(
        argv=[
            "-dataset", "MOD_TINY", "-synthetic", "-synthetic_samples", "96",
            "-batch_size", "16", "-seed", "3",
            "-hbm_budget_gb", "0.000001", "-stream_block_steps", "2",
            "-data_parallel", "4", "-model_parallel", "2",
            "-model", "DeepSense", "-learn_framework", "FOCAL",
            "-stage", "pretrain", "-epochs", "2", "-val_epochs", "2",
        ],
        output_dir=workdir,
    )
    run = Run(args)
    assert run.streaming, "tiny budget must force streaming"
    assert run.mesh_plan is not None and run.mesh_plan.mp == 2
    state, best_val_loss = pretrain(args)
    assert np.isfinite(best_val_loss)
    # the trained state kept its TP layout through the streaming blocks
    assert tp.sharded_leaf_count(state, run.mesh_plan) > 0
    n_model = 0
    sh = tp.state_shardings(state, run.mesh_plan)
    import jax

    for s, leaf in zip(jax.tree_util.tree_leaves(sh), jax.tree_util.tree_leaves(state.params)):
        spec = getattr(leaf.sharding, "spec", None)
        if spec is not None and any(ax == "model" for ax in spec):
            n_model += 1
    assert n_model > 0, "params silently re-replicated during streaming"


def test_streaming_gathered_accum_is_exact(workdir, make_args):
    """-grad_accum under streaming runs the SAME GradCache two-pass as the
    device-resident path: the streamed-block update must equal direct
    autodiff of the concatenated-features FOCAL loss over both micro-batches
    (negatives span the effective batch)."""
    import jax
    import jax.numpy as jnp
    import optax

    from focal_tpu.data.streaming import make_streaming_pretrain_fn
    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.train.losses import make_focal_loss
    from focal_tpu.train.state import init_state

    args = make_args(
        argv=["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework",
              "FOCAL", "-stage", "pretrain", "-synthetic", "-batch_size", "8",
              "-compute_dtype", "float32"],
        output_dir=workdir,
    )
    model = build_backbone(args)
    augmenter = build_augmenter(args)
    focal_loss = make_focal_loss(args)
    seq_len = args.dataset_config["seq_len"]  # 4
    n_samples = 16  # 4 subsequences, per=2 -> 2 micro-steps = 1 effective
    rng_np = np.random.default_rng(0)
    host = {
        "shake": {
            "seismic": rng_np.normal(size=(n_samples, 1, 10, 20)).astype(np.float32),
            "audio": rng_np.normal(size=(n_samples, 1, 10, 96)).astype(np.float32),
        }
    }
    subseq_idx = np.arange(n_samples).reshape(-1, seq_len)
    import jax.numpy as jnp

    sample = jax.jit(augmenter.no)(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a[:2]), host)
    )
    state0 = init_state(args, model, sample, optax.sgd(0.05), jax.random.key(0))
    rng = jax.random.key(11)
    seed = 123

    fn = make_streaming_pretrain_fn(
        model, augmenter, focal_loss, host_data=host, n_units=4, batch_size=8,
        subseq_idx=subseq_idx, mesh_plan=None, fused_views=True, seed=seed,
        block_steps=8, grad_accum=2, accum_gather=True,
    )
    assert fn.steps_per_epoch == 1 and fn.windows_per_epoch == 16
    state_s, loss_s = fn(jax.tree_util.tree_map(jnp.copy, state0), None, rng)
    assert int(state_s.step) == 1  # one EFFECTIVE update

    # ---- direct large-batch reference, mirroring the streaming internals:
    # epoch perm from default_rng(seed + epoch0), block rows = perm[:4] in
    # micro pairs, per-micro rng = fold_in(fold_in(rng, step0=0), i)
    perm = np.random.default_rng(seed + 0).permutation(4)
    rows = subseq_idx[perm].reshape(2, 8)  # [micro, per*seq]
    base = jax.random.fold_in(rng, 0)

    def direct_loss(params):
        fs1, fs2 = [], []
        stats = state0.batch_stats
        for j in range(2):
            batch = jax.tree_util.tree_map(lambda a: jnp.asarray(a[rows[j]]), host)
            rv1, rv2, rdrop = jax.random.split(jax.random.fold_in(base, j), 3)
            v1 = augmenter.random(rv1, batch)
            v2 = augmenter.random(rv2, batch)
            both = jax.tree_util.tree_map(lambda a, c: jnp.concatenate([a, c]), v1, v2)
            feats, mut = model.apply(
                {"params": params, "batch_stats": stats}, both, train=True,
                head="proj", rngs={"dropout": rdrop}, mutable=["batch_stats"],
            )
            stats = mut["batch_stats"]
            fs1.append({m: v[:8] for m, v in feats.items()})
            fs2.append({m: v[8:] for m, v in feats.items()})
        F1 = {m: jnp.concatenate([f[m] for f in fs1]) for m in fs1[0]}
        F2 = {m: jnp.concatenate([f[m] for f in fs2]) for m in fs2[0]}
        loss, _ = focal_loss(F1, F2)
        return loss

    loss_direct, grads = jax.value_and_grad(jax.jit(direct_loss))(state0.params)
    np.testing.assert_allclose(float(loss_s), float(loss_direct), rtol=2e-5)
    expected = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g, state0.params, grads)
    for e, a in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(state_s.params)):
        # atol floor 1e-7: zero-init biases whose gradients are catastrophic
        # cancellations (sums of +-1e-2 terms netting ~1e-6) land at ~1e-8
        # param scale, where f32 accumulation-order noise between the scan
        # and the unrolled reference is the whole signal. The loss equality
        # above (rtol 2e-5) plus the per-micro-vs-gathered divergence test in
        # test_grad_accum.py carry the semantic claim; this loop checks the
        # update wiring.
        scale = max(float(np.abs(np.asarray(e)).max()), 1e-12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=0,
                                   atol=max(5e-6 * scale, 1e-7))


def test_epoch_loss_weights_ragged_tail_block():
    """Regression (round-3 review): with steps_per_epoch not divisible by
    block_steps, the epoch loss must be the uniform per-step mean (matching
    the device-resident epoch fns), not an unweighted mean of block means
    that overweights the ragged tail block."""
    import jax.numpy as jnp

    from focal_tpu.data.streaming import StreamingEpochFn

    n_units = 7  # blocks of 4 + 3 at block_steps=4
    host_data = np.arange(100, 100 + n_units, dtype=np.float32)

    def make_block_fn(k):
        def block(state, block_data, rng):
            # per-step loss = the sample value; block fns return the k-mean
            return state, jnp.mean(jnp.asarray(block_data))

        return block

    class _State:
        step = 0

    fn = StreamingEpochFn(
        host_data=host_data, host_labels=None, n_units=n_units, per=1,
        unit_rows=np.arange(n_units)[:, None], make_block_fn=make_block_fn,
        seed=0, block_steps=4,
    )
    _, loss = fn(_State(), None, None)
    np.testing.assert_allclose(float(loss), host_data.mean(), rtol=1e-6)
