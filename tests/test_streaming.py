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
