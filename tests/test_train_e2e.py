"""End-to-end stage tests on MOD_TINY synthetic data (CPU).

These run the real loops: jitted train steps, validation, checkpointing,
the KNN probe, and the pretrain -> finetune weight handoff.
"""

import logging

import numpy as np
import pytest

logging.getLogger("absl").setLevel(logging.WARNING)

# multi-minute stage runs: excluded from the fast dev loop (-m "not slow")
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("e2e"))


def _argv(extra):
    return [
        "-dataset", "MOD_TINY", "-synthetic", "-synthetic_samples", "96",
        "-batch_size", "32", "-seed", "3", "-data_parallel", "1",
    ] + extra


def test_supervised_learns(workdir, make_args):
    from focal_tpu.train.loops import supervised_train

    args = make_args(
        argv=_argv(["-model", "DeepSense", "-learn_framework", "no", "-epochs", "12", "-val_epochs", "4"]),
        output_dir=workdir,
    )
    state, best_val_acc = supervised_train(args)
    # synthetic classes are separable: must beat chance (1/7) by a wide margin
    assert best_val_acc > 0.6


def test_pretrain_then_finetune(workdir, make_args):
    from focal_tpu.train.loops import pretrain, finetune

    pre_args = make_args(
        argv=_argv(
            ["-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "pretrain",
             "-epochs", "3", "-val_epochs", "2"]
        ),
        output_dir=workdir,
    )
    state, best_val_loss = pretrain(pre_args)
    assert np.isfinite(best_val_loss)

    ft_args = make_args(
        argv=_argv(
            ["-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "finetune",
             "-epochs", "6", "-val_epochs", "3"]
        ),
        output_dir=workdir,
    )
    ft_state, ft_acc = finetune(ft_args)
    assert np.isfinite(ft_acc)

    # freezing: backbone params unchanged by finetuning, head params exist
    import jax

    pre_params = state.params
    deltas = {}
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(pre_params)[0],
        jax.tree_util.tree_flatten_with_path(ft_state.params)[0],
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        deltas[name] = float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
    frozen = [k for k in deltas if "class_layer" not in k and "mod_fusion_layer" not in k]
    trained = [k for k in deltas if "class_layer" in k]
    assert all(deltas[k] == 0.0 for k in frozen), [k for k in frozen if deltas[k] != 0]
    assert any(deltas[k] > 0.0 for k in trained)


def test_blocked_epochs_match_cadence(workdir, make_args):
    """-epochs_per_call runs multi-epoch device calls but must preserve the
    validation cadence (after epochs 0, val_epochs, 2*val_epochs, ...)."""
    import logging

    from focal_tpu.train.loops import supervised_train

    args = make_args(
        argv=_argv(["-model", "DeepSense", "-learn_framework", "no", "-epochs", "7",
                    "-val_epochs", "3", "-epochs_per_call", "3"]),
        output_dir=workdir,
    )
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger().addHandler(handler)
    try:
        state, best = supervised_train(args)
    finally:
        logging.getLogger().removeHandler(handler)
    val_labels = [int(m.split("epoch ")[1].split(":")[0]) for m in records if "train loss" in m]
    assert val_labels == [0, 3, 6]  # same labels as the 1-epoch path
    # 7 epochs x 2 steps happened regardless of blocking
    assert int(state.step) == 7 * 2
    assert np.isfinite(best)


def test_test_cli_roundtrip(workdir, make_args, monkeypatch):
    """test.py surface: reload the supervised best checkpoint and evaluate."""
    import test as test_cli

    args = make_args(
        argv=_argv(["-model", "DeepSense", "-learn_framework", "no"]),
        option="test",
        output_dir=workdir,
    )
    loss, acc, f1 = test_cli.test(args)
    assert np.isfinite(loss)
    assert acc > 0.6


def test_predict_cli_roundtrip(workdir, make_args):
    """predict.py surface: serve the supervised best checkpoint on synthetic
    inputs (labels known -> accuracy must track the test.py number)."""
    import os

    import predict as predict_cli
    from focal_tpu.data.synthetic import synthetic_arrays

    args = make_args(
        argv=_argv(["-model", "DeepSense", "-learn_framework", "no"]),
        option="test",
        output_dir=workdir,
    )
    args.predictions_out = os.path.join(workdir, "preds.json")
    result = predict_cli.predict(args)

    _, labels, _ = synthetic_arrays(args.dataset_config, args.task, args.synthetic_samples,
                                    seed=args.seed + 3)
    acc = float((result["preds"] == labels).mean())
    assert acc > 0.6
    assert os.path.exists(args.predictions_out)
