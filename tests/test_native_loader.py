"""Native C++ bulk .npz loader: parity with the Python path + fallbacks."""

import os
import time

import numpy as np
import pytest

from focal_tpu import native
from focal_tpu.data.dataset import ArrayDataset, _bulk_load_native
from focal_tpu.data.synthetic import write_synthetic_sample_files


@pytest.fixture(scope="module")
def sample_dir(tmp_path_factory, ):
    from focal_tpu.params.yaml_utils import load_dataset_config

    cfg = load_dataset_config("MOD_TINY")
    d = tmp_path_factory.mktemp("native_npz")
    index_files = write_synthetic_sample_files(cfg, "vehicle_classification", str(d), 48)
    return index_files


def test_native_builds():
    assert native.available(), "g++ toolchain present in this image; build must succeed"


def test_native_matches_python(sample_dir):
    idx = sample_dir["train"]
    paths = [str(p) for p in np.loadtxt(idx, dtype=str, ndmin=1)]

    got = _bulk_load_native(paths, "vehicle_classification")
    assert got is not None, "native path must engage for npz files"
    stacked, labels = got

    # python reference load
    ds = ArrayDataset.from_index_file(idx, "vehicle_classification")  # uses native too
    with np.load(paths[3]) as z:
        np.testing.assert_array_equal(stacked["shake"]["audio"][3], z["data.shake.audio"])
        assert labels[3] == int(z["label.vehicle_type"])
    np.testing.assert_array_equal(ds.data["shake"]["audio"], stacked["shake"]["audio"])
    np.testing.assert_array_equal(ds.labels, labels.astype(np.int32))


def test_native_fallback_on_corrupt_file(sample_dir, tmp_path):
    idx = sample_dir["val"]
    paths = [str(p) for p in np.loadtxt(idx, dtype=str, ndmin=1)]
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not a zip at all")
    got = _bulk_load_native(paths + [str(bad)], "vehicle_classification")
    assert got is None  # native reports failure -> caller falls back


def test_native_fallback_on_compressed(tmp_path):
    p = tmp_path / "c.npz"
    np.savez_compressed(p, **{"label": np.int32(1), "data.l.m": np.zeros((1, 2, 3), np.float32)})
    got = _bulk_load_native([str(p)], "vehicle_classification")
    assert got is None  # compressed members are not handled natively


def test_native_is_not_slower(sample_dir):
    """Sanity: the native bulk load beats a per-file numpy loop."""
    idx = sample_dir["pretrain"]
    paths = [str(p) for p in np.loadtxt(idx, dtype=str, ndmin=1)]

    t0 = time.perf_counter()
    for _ in range(3):
        native_out = _bulk_load_native(paths, "vehicle_classification")
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(3):
        py = [dict(np.load(p)) for p in paths]
    t_python = time.perf_counter() - t0

    assert native_out is not None
    # don't be strict on CI noise; just require it's not pathologically slow
    assert t_native < t_python * 2.0
