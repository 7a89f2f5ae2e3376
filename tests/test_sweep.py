"""sweep.py smoke (VERDICT round-2 item 8): the label-ratio sweep CLI —
the only entry point previously without a test; it implements BASELINE
config #5 (reference analogue: individual -label_ratio launches,
src/params/base_params.py:59-64). Runs a 2-ratio supervised sweep on
MOD_TINY synthetic and checks the collated table."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_sweep_cli_supervised(tmp_path):
    out = tmp_path / "sweep_results.json"
    env = dict(os.environ)
    env["FOCAL_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "sweep.py"),
         "-model=DeepSense", "-dataset=MOD_TINY", "-learn_framework=no",
         "-synthetic", "-synthetic_samples", "64", "-batch_size", "16",
         "-epochs", "2", "-val_epochs", "2", "-ratios", "0.5,1.0",
         "-out", str(out), "-output_dir", str(tmp_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=900,
    )
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-3000:]
    results = json.loads(out.read_text())
    assert len(results) == 2
    ratios = [r["label_ratio"] for r in results]
    assert ratios == [0.5, 1.0]
    for r in results:
        assert r["task"] == "vehicle_classification"
        assert 0.0 <= r["best_val_acc"] <= 1.0
    # the collated table is printed
    assert "best val acc" in p.stdout
