"""Serving surface (focal_tpu/serve.py): AOT-compiled fixed-batch inference
with ragged-tail padding, optional-label inputs, and predictions JSON.
No reference equivalent (src/test.py only evaluates a labeled split)."""

import json
import os

import jax
import numpy as np
import optax
import pytest

from focal_tpu.data.synthetic import synthetic_arrays, write_synthetic_sample_files
from focal_tpu.serve import Predictor, load_input, write_predictions
from focal_tpu.train import checkpoint as ckpt
from focal_tpu.train.state import init_state


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """An (untrained) checkpoint + Predictor on MOD_TINY DeepSense."""
    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.params.cli import build_parser

    tmp = tmp_path_factory.mktemp("serve")
    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "no",
         "-synthetic", "-batch_size", "8"]
    )
    args.option = "train"
    args.output_dir = str(tmp)
    args = set_auto_params(args)

    model = build_backbone(args)
    augmenter = build_augmenter(args)
    data, labels, names = synthetic_arrays(args.dataset_config, args.task, 20, seed=5)
    sample = jax.jit(augmenter.no)(
        jax.tree_util.tree_map(lambda a: jax.numpy.asarray(a[:2]), data)
    )
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    path = os.path.join(str(tmp), "ckpt_best")
    ckpt.save_state(path, state)

    predictor = Predictor(args, checkpoint=path)
    return args, model, augmenter, state, predictor, (data, labels, names)


def test_predict_shapes_and_parity(served):
    args, model, augmenter, state, predictor, (data, labels, names) = served
    result = predictor.predict(data)
    n = len(names)
    assert result["probs"].shape == (n, args.dataset_config[args.task]["num_classes"])
    assert result["preds"].shape == (n,)
    np.testing.assert_allclose(result["probs"].sum(-1), 1.0, rtol=1e-5)
    assert result["latency"]["windows_per_s"] > 0

    # parity with a direct eval-mode apply on the first full batch
    batch = jax.tree_util.tree_map(lambda a: jax.numpy.asarray(a[:8]), data)
    freq_x = augmenter.no(batch)
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        freq_x, train=False, head="class",
    )
    ref = np.asarray(jax.nn.softmax(logits.astype(jax.numpy.float32), -1))
    np.testing.assert_allclose(result["probs"][:8], ref, rtol=1e-4, atol=1e-6)


def test_ragged_tail_padding_is_inert(served):
    *_, predictor, (data, labels, names) = served
    full = predictor.predict(data)  # 20 = 2 full batches + ragged 4
    tail = jax.tree_util.tree_map(lambda a: a[16:], data)
    alone = predictor.predict(tail)
    np.testing.assert_allclose(full["probs"][16:], alone["probs"], rtol=1e-5, atol=1e-7)


def test_load_input_index_dir_and_unlabeled(served, tmp_path):
    args = served[0]
    write_synthetic_sample_files(args.dataset_config, args.task, str(tmp_path), 16, seed=2)
    index = os.path.join(str(tmp_path), "test_index.txt")
    data, labels, names = load_input(index, args.task)
    n = len(names)
    assert n > 0 and (labels >= 0).all()
    first = next(iter(next(iter(data.values())).values()))
    assert first.shape[0] == n

    # directory mode finds the same files (all splits' samples live together)
    data_d, labels_d, names_d = load_input(str(tmp_path), args.task)
    assert len(names_d) >= n

    # a sample without a label key loads with label -1
    unl_dir = tmp_path / "unlabeled"
    unl_dir.mkdir()
    loc = args.dataset_config["location_names"][0]
    mods = {m: np.asarray(a[0], np.float32) for m, a in data[loc].items()}
    np.savez(unl_dir / "s0.npz", **{f"data.{loc}.{m}": a for m, a in mods.items()})
    data_u, labels_u, names_u = load_input(str(unl_dir), args.task)
    assert labels_u.tolist() == [-1]


def test_write_predictions_json(served, tmp_path):
    *_, predictor, (data, labels, names) = served
    result = predictor.predict(data)
    out = tmp_path / "preds.json"
    write_predictions(str(out), names, result, labels)
    payload = json.loads(out.read_text())
    assert len(payload["predictions"]) == len(names)
    assert payload["predictions"][0]["sample"] == names[0]
    assert "label" in payload["predictions"][0]  # synthetic inputs carry labels
    assert payload["latency"]["batches"] == int(np.ceil(len(names) / 8))
