import numpy as np
import pytest

from focal_tpu.data.dataset import ArrayDataset, partition_subsequences
from focal_tpu.data.loader import create_dataloader
from focal_tpu.data.synthetic import make_synthetic_dataset, write_synthetic_sample_files


def test_auto_params_supervised(make_args):
    args = make_args(argv=["-model", "DeepSense", "-learn_framework", "no"])
    assert args.train_mode == "supervised"
    assert args.task == "vehicle_classification"
    # the reference's default rule keys on -stage alone (default "pretrain"),
    # so supervised runs without -stage also get 256 (params_util.py:91-101)
    assert args.batch_size == 256
    assert args.dataset_config["num_segments"] == 10
    assert "exp0_supervised_vehicle_classification_1.0" in args.weight_folder


def test_auto_params_pretrain_defaults(make_args):
    args = make_args(argv=["-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "pretrain"])
    assert args.train_mode == "contrastive"
    assert args.batch_size == 256
    assert args.sequence_sampler


def test_batch_size_default_rule(make_args):
    # supervised runs use stage default "pretrain" on the CLI but batch size
    # derives from the stage flag exactly as the reference does
    args = make_args(argv=["-learn_framework", "no", "-batch_size", "32"])
    assert args.batch_size == 32


def test_exp_folder_versioning(make_args, tmp_path):
    a1 = make_args(argv=["-model", "DeepSense", "-learn_framework", "no"])
    a2 = make_args(argv=["-model", "DeepSense", "-learn_framework", "no"])
    assert a1.weight_folder != a2.weight_folder
    assert a2.weight_folder.endswith("exp1_supervised_vehicle_classification_1.0")


def test_partition_subsequences():
    names = [f"runA_{i}.npz" for i in range(6)] + [f"runB_{i}.npz" for i in range(3)]
    sub = partition_subsequences(names, seq_len=4)
    assert sub.shape == (3, 4)
    # runA: [0,1,2,3], [4,5,5,5]; runB: [6,7,8,8]
    assert sub[0].tolist() == [0, 1, 2, 3]
    assert sub[1].tolist() == [4, 5, 5, 5]
    assert sub[2].tolist() == [6, 7, 8, 8]


def test_partition_subsequences_dash_delimiter():
    """RealWorld_HAR file names use '-' (reference: multi_modal_dataset.py:74-78)."""
    names = [f"sub1-walking-{i}.npz" for i in range(5)] + [f"sub2-running-{i}.npz" for i in range(2)]
    sub = partition_subsequences(names, seq_len=4, delimiter="-")
    assert sub.shape == (3, 4)
    assert sub[0].tolist() == [0, 1, 2, 3]
    assert sub[1].tolist() == [4, 4, 4, 4]  # lone tail sample repeat-padded
    assert sub[2].tolist() == [5, 6, 6, 6]


def test_synthetic_shapes(mod_config):
    ds = make_synthetic_dataset(mod_config, "vehicle_classification", 32, seq_len=4)
    assert ds.data["shake"]["audio"].shape == (32, 1, 10, 1600)
    assert ds.data["shake"]["seismic"].shape == (32, 1, 10, 20)
    assert ds.labels.shape == (32,)
    assert ds.subseq_idx.shape == (8, 4)
    # all samples in a subsequence share one label (same recording)
    for row in ds.subseq_idx:
        assert len(set(ds.labels[row].tolist())) == 1


def test_loader_static_shapes(make_args):
    args = make_args(argv=["-model", "DeepSense", "-learn_framework", "no", "-batch_size", "24"])
    loader = create_dataloader("train", args)
    batches = list(loader)
    assert len(batches) == 64 // 24  # drop_last
    for b in batches:
        assert b.idx.shape == (24,)
        assert b.weight.all()
    val = create_dataloader("val", args)
    vb = list(val)
    assert all(b.idx.shape == vb[0].idx.shape for b in vb)
    # eval tail is padded and masked out
    total_valid = sum(int(b.weight.sum()) for b in vb)
    assert total_valid == 16


def test_sequence_loader(make_args):
    args = make_args(
        argv=["-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "pretrain", "-batch_size", "32"]
    )
    loader = create_dataloader("train", args)
    b = next(iter(loader))
    assert b.idx.shape == (32,)
    # samples arrive in whole subsequences: labels constant within each window
    labels = loader.dataset.labels[b.idx].reshape(-1, 4)
    assert (labels == labels[:, :1]).all()


def test_npz_roundtrip(mod_config, tmp_path):
    index_files = write_synthetic_sample_files(
        mod_config, "vehicle_classification", str(tmp_path / "modsyn"), 24
    )
    ds = ArrayDataset.from_index_file(index_files["train"], "vehicle_classification", seq_len=4)
    assert len(ds) > 0
    assert ds.data["shake"]["audio"].shape[1:] == (1, 10, 1600)
    assert ds.subseq_idx is not None


def test_label_ratio_subsample(mod_config):
    ds = make_synthetic_dataset(mod_config, "vehicle_classification", 40, seq_len=4)
    sub = ds.subsample(0.5)
    assert len(sub) == 20
