import os

import numpy as np
import pytest

from focal_tpu.data.dataset import ArrayDataset
from focal_tpu.data.preprocess.mod import (
    FREQS,
    extract_samples_from_signals,
    process_shake,
)
from focal_tpu.data.preprocess.partition import partition_samples
from focal_tpu.data.preprocess.signal import extract_time_freq, resample, split_with_overlap


def test_resample_halves_rate_preserves_tone():
    """A pure 100 Hz tone must survive 16k -> 8k polyphase resampling."""
    t = np.arange(16000 * 2) / 16000.0
    x = np.sin(2 * np.pi * 100 * t)[:, None]
    y = resample(x, 16000, 8000)
    assert abs(len(y) - 16000) <= 1
    t2 = np.arange(len(y)) / 8000.0
    want = np.sin(2 * np.pi * 100 * t2)
    # ignore filter edge transients
    err = np.abs(y[500:-500, 0] - want[500:-500]).max()
    assert err < 1e-3


def test_sinc_resample_kernel_golden():
    """Kernel rows against the published formula evaluated with independent
    scalar math (torchaudio Resample defaults: hann window, lpw=6,
    rolloff=0.99). Guards the vectorised construction."""
    import math

    from focal_tpu.data.preprocess.signal import _sinc_resample_kernel

    for o, n in ((2, 1), (3, 2), (5, 4)):
        kernel, width = _sinc_resample_kernel(o, n)
        base = min(o, n) * 0.99
        assert width == math.ceil(6 * o / base)
        for p in (0, n - 1):
            for k in (0, 1, width, kernel.shape[1] - 1):
                u = (k - width) / o - p / n
                t = max(-6.0, min(6.0, base * u))
                window = math.cos(t * math.pi / 12.0) ** 2
                sinc = 1.0 if t == 0 else math.sin(math.pi * t) / (math.pi * t)
                want = sinc * window * base / o
                np.testing.assert_allclose(kernel[p, k], want, rtol=1e-12, atol=1e-15)


def test_resample_output_length_rule():
    """Output length must follow torchaudio's ceil(new * len / orig)."""
    for o, n, length in ((16000, 8000, 31999), (16000, 8000, 32000), (3, 2, 10)):
        x = np.zeros((length, 1))
        assert len(resample(x, o, n)) == int(np.ceil(n * length / o))


def test_split_with_overlap():
    x = np.arange(100)[:, None]
    w = split_with_overlap(x, 0.0, interval_len=20)
    assert w.shape == (5, 20, 1)
    w2 = split_with_overlap(x, 0.5, interval_len=20)
    assert w2.shape == (9, 20, 1)
    assert (w2[1][:, 0] == np.arange(10, 30)).all()


def test_extract_time_freq_layout():
    """Freq layout must equal the on-device FFT layout (interleaved re/im)."""
    rng = np.random.default_rng(0)
    seg = rng.normal(size=(2 * 100, 3)).astype(np.float32)  # 2 s at 100 Hz, 3 ch
    time, freq = extract_time_freq(seg, 0.2, 100)
    assert time.shape == (3, 10, 20)
    assert freq.shape == (6, 10, 20)
    spec0 = np.fft.fft(time[0], axis=-1)
    np.testing.assert_allclose(freq[0], spec0.real, atol=1e-4)
    np.testing.assert_allclose(freq[1], spec0.imag, atol=1e-4)


def test_extract_samples_shapes():
    rng = np.random.default_rng(1)
    signals = {
        "audio": rng.normal(size=(int(FREQS["audio"] * 5), 1)).astype(np.float32),
        "seismic": rng.normal(size=(int(FREQS["seismic"] * 5), 1)).astype(np.float32),
    }
    samples = extract_samples_from_signals(signals)
    assert len(samples) == 2  # 5 s -> two complete 2 s segments
    s = samples[0]
    assert s["data"]["shake"]["audio"].shape == (1, 10, 1600)
    assert s["data"]["shake"]["seismic"].shape == (1, 10, 20)
    assert s["freq_data"]["shake"]["audio"].shape == (2, 10, 1600)


def _write_raw_recording(root, run, shake, seconds=5):
    rng = np.random.default_rng(hash((run, shake)) % 2**32)
    d = os.path.join(root, run, shake)
    os.makedirs(d)
    np.savetxt(os.path.join(d, "aud16000.csv"), rng.normal(size=16000 * seconds), delimiter=",")
    np.savetxt(os.path.join(d, "ehz.csv"), rng.normal(size=100 * seconds), delimiter=",")


def test_process_shake_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "samples"
    _write_raw_recording(str(raw), "Polaris0150pm", "rs1")
    paths = process_shake("Polaris0150pm", "rs1", str(raw), str(out))
    assert len(paths) == 2
    # loadable through the dataset layer, with the task-keyed label
    idx = tmp_path / "index.txt"
    idx.write_text("\n".join(paths) + "\n")
    ds = ArrayDataset.from_index_file(str(idx), "vehicle_classification", seq_len=2)
    assert len(ds) == 2
    assert (ds.labels == 0).all()  # Polaris -> 0
    assert ds.data["shake"]["audio"].shape == (2, 1, 10, 1600)
    assert ds.subseq_idx.shape == (1, 2)


def test_speed_distance_labels(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "samples"
    _write_raw_recording(str(raw), "tesla_10mph_distance2", "rs1")
    paths = process_shake("tesla_10mph_distance2", "rs1", str(raw), str(out))
    ds_speed = _index_and_load(tmp_path, paths, "speed_classification")
    assert (ds_speed.labels == 1).all()  # 10mph -> 1
    ds_dist = _index_and_load(tmp_path, paths, "distance_classification")
    assert (ds_dist.labels == 1).all()  # distance2 -> 1
    ds_vehicle = _index_and_load(tmp_path, paths, "vehicle_classification")
    assert (ds_vehicle.labels == 4).all()  # tesla -> 4


def _index_and_load(tmp_path, paths, task):
    idx = tmp_path / f"{task}_index.txt"
    idx.write_text("\n".join(paths) + "\n")
    return ArrayDataset.from_index_file(str(idx), task)


def test_partition(tmp_path):
    d = tmp_path / "samples"
    os.makedirs(d)
    for i in range(10):
        np.savez(d / f"run_{i}.npz", label=np.int32(0))
    extra = tmp_path / "extra"
    os.makedirs(extra)
    for i in range(4):
        np.savez(extra / f"x_{i}.npz", label=np.int32(0))
    idx = partition_samples(str(d), str(tmp_path / "out"), extra_dir=str(extra))
    train = open(idx["train"]).read().split()
    val = open(idx["val"]).read().split()
    test = open(idx["test"]).read().split()
    pre = open(idx["pretrain"]).read().split()
    assert len(train) == 8 and val == test and len(val) == 2
    assert len(pre) == 12  # 4 extra + 8 train
    assert set(train).isdisjoint(val)


def test_partition_drops_incomplete_samples(tmp_path):
    """The reference keeps only samples with the complete modality set
    (partition_data.py:44-117, flag-product check per torch.load); .npz
    samples missing a (loc, mod) key other samples carry must be dropped,
    and .pt samples with a zero flag likewise."""
    import torch

    d = tmp_path / "samples"
    os.makedirs(d)
    full = {"data.shake.audio": np.zeros((1, 2, 3), np.float32),
            "data.shake.seismic": np.zeros((1, 2, 3), np.float32)}
    for i in range(8):
        np.savez(d / f"motor_rs1_{i}.npz", label=np.int32(0), **full)
    # incomplete: missing seismic
    np.savez(d / "motor_rs1_bad.npz", label=np.int32(0),
             **{"data.shake.audio": np.zeros((1, 2, 3), np.float32)})
    # reference-format .pt with a zero modality flag
    torch.save(
        {"label": {"vehicle_type": 0}, "flag": {"shake": {"audio": 1, "seismic": 0}},
         "data": {"shake": {"audio": torch.zeros(1, 2, 3), "seismic": torch.zeros(1, 2, 3)}}},
        d / "motor_rs1_badflag.pt",
    )
    extra = tmp_path / "extra"
    os.makedirs(extra)
    np.savez(extra / "x_0.npz", label=np.int32(0), **full)
    np.savez(extra / "x_bad.npz", label=np.int32(0),
             **{"data.shake.audio": np.zeros((1, 2, 3), np.float32)})

    idx = partition_samples(str(d), str(tmp_path / "out"), extra_dir=str(extra))
    listed = set()
    for name in ("train", "val", "test", "pretrain"):
        listed |= set(open(idx[name]).read().split())
    assert not any("bad" in p for p in listed)
    train = open(idx["train"]).read().split()
    val = open(idx["val"]).read().split()
    assert len(train) + len(val) == 8  # the 8 complete .npz samples
    assert len(open(idx["pretrain"]).read().split()) == 1 + len(train)

    # keep-incomplete escape hatch indexes everything
    idx2 = partition_samples(str(d), str(tmp_path / "out2"), extra_dir=str(extra),
                             require_complete=False)
    all2 = set(open(idx2["train"]).read().split()) | set(open(idx2["val"]).read().split())
    assert len(all2) == 10


def test_partition_name_allowlists(tmp_path):
    """Target/shake filename allowlists (reference partition_data.py:60-66)."""
    d = tmp_path / "samples"
    os.makedirs(d)
    for name in ("motor_rs1_0", "motor_rs9_0", "pickup_rs1_0", "tesla_rs2_0"):
        np.savez(d / f"{name}.npz", label=np.int32(0))
    idx = partition_samples(str(d), str(tmp_path / "out"),
                            targets={"motor", "tesla"}, shakes={"rs1", "rs2"})
    kept = {os.path.basename(p) for p in
            set(open(idx["train"]).read().split()) | set(open(idx["val"]).read().split())}
    assert kept == {"motor_rs1_0.npz", "tesla_rs2_0.npz"}


def _mkdirs(root, layout):
    for run, shakes in layout.items():
        for s in shakes:
            os.makedirs(os.path.join(root, run, s), exist_ok=True)


def test_select_jobs_allowlists(tmp_path):
    """Labeled flow: PRESERVED_CLEAN_FOLDERS only; _2 folders use rs1, others
    SUBJECTS={rs3}. Pretrain flow: PRESERVED_EXTRA_FOLDERS table
    (reference: extract_samples.py:330-360, extract_pretrain_samples.py:153-165)."""
    from focal_tpu.data.preprocess.mod import select_jobs

    root = str(tmp_path / "raw")
    _mkdirs(root, {
        "tesla": ["rs1", "rs2", "rs3", "rs7"],
        "Polaris0150pm": ["rs1", "rs3"],
        "bicycle2": ["rs1", "rs3"],   # not in CLEAN list, in EXTRA list
        "randomjunk": ["rs3"],        # in neither
    })
    labeled = select_jobs(root, pretrain=False)
    assert labeled == [("Polaris0150pm", "rs1"), ("tesla", "rs3")]

    pre = select_jobs(root, pretrain=True)
    assert ("bicycle2", "rs1") in pre and ("bicycle2", "rs3") in pre
    assert ("tesla", "rs1") in pre and ("tesla", "rs2") in pre and ("tesla", "rs7") in pre
    assert not any(r == "tesla" and s == "rs3" for r, s in pre)  # tesla extra = rs1/rs2/rs7
    assert not any(r in ("Polaris0150pm", "randomjunk") for r, _ in pre)

    # fabricated layouts with no allowlisted folder still extract (auto mode)
    root2 = str(tmp_path / "raw2")
    _mkdirs(root2, {"myrun": ["rs1"]})
    assert select_jobs(root2) == [("myrun", "rs1")]


def test_trim_tables_applied_by_default(tmp_path, monkeypatch):
    """process_dataset pulls per-recording trims from the data_trunk tables
    (effective values — the reference's duplicated 'tesla' literal means the
    second entry wins; reference: data_trunk.py:17-18,46-47)."""
    from focal_tpu.data.preprocess import mod as modpp
    from focal_tpu.data.preprocess.mod_tables import default_shift

    assert default_shift("tesla", "rs3") == (80, 90)
    assert default_shift("pickup", "rs7") == (290, 30)
    assert default_shift("Warhog1135am", "rs1") == (0, 0)
    assert default_shift("unknownfolder", "rs1") == (0, 0)

    root = str(tmp_path / "raw")
    _mkdirs(root, {"tesla": ["rs3"], "Polaris0150pm": ["rs1"]})
    calls = []

    def fake_process_shake(run, shake, inp, out, start=0.0, end=0.0, save_freq=False):
        calls.append((run, shake, start, end))
        return []

    monkeypatch.setattr(modpp, "process_shake", fake_process_shake)
    modpp.process_dataset(root, str(tmp_path / "out"))
    assert ("tesla", "rs3", 80, 90) in calls
    assert ("Polaris0150pm", "rs1", 0, 0) in calls
