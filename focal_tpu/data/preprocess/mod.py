"""MOD raw-data extraction: CSV sensor dumps -> per-2s-segment sample files.

Rebuild of the reference's offline pipeline
(reference: src/data_preprocess/MOD/extract_samples.py:15-382,
extract_pretrain_samples.py, extract_samples_speed_distance.py):

  raw shake folders {run}/{shake}/{aud16000.csv|aud.csv, ehz.csv}
  -> trim per-recording start/end shifts
  -> resample audio 16 kHz -> 8 kHz
  -> split into 2 s segments, each into 10 x 0.2 s intervals
  -> save time-domain (and optionally freq-domain) .npz samples named
     {run}_{shake}_{segment_id}.npz  (the trailing id drives subsequence
     grouping in the sequence dataset).

Speed/distance labels are parsed from folder names ("5mph", "distance2", ...)
into a task-keyed label dict, mirroring extract_samples_speed_distance.py.

Usage:
  python -m focal_tpu.data.preprocess.mod --input RAW_DIR --output OUT_DIR \
      [--pretrain] [--save-freq]
"""

import argparse
import os
import re

import numpy as np

from focal_tpu.data.preprocess.signal import extract_time_freq, resample, segment_recording

SEGMENT_SPAN = 2
INTERVAL_SPAN = 0.2
AUD_DOWNSAMPLE_RATE = 2
FREQS = {"audio": 16000 / AUD_DOWNSAMPLE_RATE, "seismic": 100, "acc": 100}

VEHICLE_LABELS = {
    "Polaris": 0, "Warhog": 1, "Silverado": 2, "motor": 3, "tesla": 4,
    "mustang": 5, "walk": 6, "bicycle": 7, "forester": 8, "pickup": 9, "scooter": 10,
}

SPEED_LABELS = {"5mph": 0, "10mph": 1, "15mph": 2, "20mph": 3}
DISTANCE_PATTERN = re.compile(r"distance(\d+)")


def folder_to_label(folder):
    """Vehicle-class label from a run folder name
    (reference: extract_samples.py:93-103)."""
    for name, idx in VEHICLE_LABELS.items():
        if name in folder:
            return name, idx
    raise ValueError(f"No vehicle label found in folder name: {folder}")


def parse_aux_labels(folder):
    """Optional speed/distance labels parsed from the folder name
    (reference: extract_samples_speed_distance.py:60-90)."""
    labels = {}
    for token, idx in SPEED_LABELS.items():
        if token in folder:
            labels["speed"] = idx
    m = DISTANCE_PATTERN.search(folder)
    if m:
        labels["distance"] = int(m.group(1)) - 1
    return labels


def load_shake_csvs(shake_path, start_shift=0.0, end_shift=0.0):
    """Load one shake's audio + seismic CSVs, trim shifts, resample audio.
    Returns {"audio": [t, 1], "seismic": [t, 1]} at FREQS rates."""
    files = os.listdir(shake_path)
    audio_file = "aud16000.csv" if "aud16000.csv" in files else "aud.csv"
    raw_audio = np.loadtxt(os.path.join(shake_path, audio_file), dtype=float, delimiter=",", ndmin=2)
    raw_seismic = np.loadtxt(os.path.join(shake_path, "ehz.csv"), dtype=float, delimiter=",", ndmin=2)

    audio = resample(raw_audio, 16000, FREQS["audio"])
    seismic = raw_seismic  # already at 100 Hz

    out = {}
    for mod, arr in (("audio", audio), ("seismic", seismic)):
        f = FREQS[mod]
        start = int(start_shift * f)
        end = len(arr) - int(end_shift * f)
        out[mod] = arr[start:end].astype(np.float32)
    return out


def extract_samples_from_signals(signals, loc="shake"):
    """{mod: [t, c]} -> list of {"data": {loc: {mod: [c,i,s]}},
    "freq_data": {...}} 2-second samples (complete segments only)."""
    segments = {
        mod: segment_recording(arr, FREQS[mod], SEGMENT_SPAN) for mod, arr in signals.items()
    }
    n = min(len(s) for s in segments.values())
    samples = []
    for i in range(n):
        time_data, freq_data = {}, {}
        for mod in signals:
            t, f = extract_time_freq(segments[mod][i], INTERVAL_SPAN, FREQS[mod])
            time_data[mod] = t
            freq_data[mod] = f
        samples.append({"data": {loc: time_data}, "freq_data": {loc: freq_data}})
    return samples


def save_sample(path, data, label):
    """Write one sample .npz in the framework schema
    (see focal_tpu.data.dataset)."""
    arrays = {}
    if isinstance(label, dict):
        for k, v in label.items():
            arrays[f"label.{k}"] = np.int32(v)
    else:
        arrays["label"] = np.int32(label)
    for loc, mods in data.items():
        for mod, arr in mods.items():
            arrays[f"data.{loc}.{mod}"] = arr
    np.savez(path, **arrays)


def process_shake(run_folder, shake, input_path, output_dir, start_shift=0.0, end_shift=0.0, save_freq=False):
    """Process one (run, shake) recording into sample files. Returns paths."""
    shake_path = os.path.join(input_path, run_folder, shake)
    signals = load_shake_csvs(shake_path, start_shift, end_shift)
    _, vehicle_id = folder_to_label(run_folder)
    aux = parse_aux_labels(run_folder)
    label = {"vehicle_type": vehicle_id, **aux} if aux else vehicle_id

    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for i, sample in enumerate(extract_samples_from_signals(signals)):
        path = os.path.join(output_dir, f"{run_folder}_{shake}_{i}.npz")
        save_sample(path, sample["data"], label)
        paths.append(path)
        if save_freq:
            fpath = os.path.join(output_dir + "_freq", f"{run_folder}_{shake}_{i}.npz")
            os.makedirs(os.path.dirname(fpath), exist_ok=True)
            save_sample(fpath, sample["freq_data"], label)
    return paths


def process_dataset(input_path, output_dir, shifts=None, save_freq=False, workers=0):
    """Walk {run}/{shake}/ folders and extract every recording.
    shifts: optional {run: {shake: (start_s, end_s)}} trim table
    (reference: data_trunk.py)."""
    shifts = shifts or {}
    jobs = []
    for run_folder in sorted(os.listdir(input_path)):
        run_path = os.path.join(input_path, run_folder)
        if not os.path.isdir(run_path):
            continue
        for shake in sorted(os.listdir(run_path)):
            if not os.path.isdir(os.path.join(run_path, shake)):
                continue
            start, end = shifts.get(run_folder, {}).get(shake, (0.0, 0.0))
            jobs.append((run_folder, shake, start, end))

    all_paths = []
    if workers and workers > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as pool:
            futures = [
                pool.submit(process_shake, r, s, input_path, output_dir, st, en, save_freq)
                for r, s, st, en in jobs
            ]
            for f in futures:
                all_paths.extend(f.result())
    else:
        for r, s, st, en in jobs:
            all_paths.extend(process_shake(r, s, input_path, output_dir, st, en, save_freq))
    return all_paths


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="Raw MOD root ({run}/{shake}/*.csv)")
    parser.add_argument("--output", required=True, help="Output sample directory")
    parser.add_argument("--save-freq", action="store_true", help="Also save freq-domain samples")
    parser.add_argument("--workers", type=int, default=0)
    args = parser.parse_args()
    paths = process_dataset(args.input, args.output, save_freq=args.save_freq, workers=args.workers)
    print(f"Extracted {len(paths)} samples to {args.output}")


if __name__ == "__main__":
    main()
