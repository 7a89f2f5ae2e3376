"""Multi-process data parallelism (VERDICT round-2 item 1; SURVEY §2.6).

Two layers of coverage, both launching real subprocesses:

1. Parity: tools/dist_worker.py runs 3 sharded-layout pretrain epochs. A
   2-process x 4-device run (local gloo coordinator) must produce the same
   per-epoch losses and final parameter checksum as the single-process
   8-device run — same global mesh, same seeds, so the math is identical up
   to collective reduction order.
2. CLI e2e smoke (slow): the full train.py pipeline (eval + KNN + orbax
   checkpoints + KV-synced exp folder) across 2 processes sharing one
   output tree.

Reference analogue being replaced: single-device selection at
src/params/params_util.py:20-55 (the reference cannot run multi-process).
"""

import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_local_devices, tmpdir):
    env = dict(os.environ)
    env["FOCAL_PLATFORM"] = "cpu"
    # gloo's context handshake times out at 30s by default — first-compile
    # skew between the two processes is routinely larger than that
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices} "
        "--xla_cpu_collective_timeout_seconds=600"
    )
    env["PYTHONPATH"] = REPO
    env["TMPDIR"] = tmpdir
    env.pop("JAX_PLATFORMS", None)
    return env


def _communicate(procs, timeout=1200):
    logs = {}
    try:
        for name, p in procs.items():
            out, _ = p.communicate(timeout=timeout)
            logs[name] = out
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()  # SIGKILL: jax.distributed swallows SIGTERM
                p.communicate()
    return logs


def _worker(extra, tmpdir, n_local):
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "dist_worker.py"), *extra],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(n_local, tmpdir), cwd=tmpdir,
    )


def _result(log):
    for line in log.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON result in:\n{log[-3000:]}")


@pytest.mark.slow
def test_two_process_updates_match_single_process():
    port = 29000 + os.getpid() % 1000
    coord = ["--coordinator", f"127.0.0.1:{port}", "--nproc", "2"]
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        # the pair must run concurrently (they rendezvous); the single-process
        # run goes after to keep peak load down on small hosts
        procs = {
            "proc0": _worker([*coord, "--pid", "0"], d2, 4),
            "proc1": _worker([*coord, "--pid", "1"], d2, 4),
        }
        logs = _communicate(procs)
        for name, p in procs.items():
            assert p.returncode == 0, f"{name} failed:\n{logs[name][-4000:]}"
        single = _worker([], d1, 8)
        out, _ = single.communicate(timeout=1200)
        assert single.returncode == 0, out[-4000:]

    r_single = _result(out)
    r0 = _result(logs["proc0"])
    r1 = _result(logs["proc1"])
    assert r_single["n_devices"] == 8 and r0["n_devices"] == 8
    # identical math up to collective reduction order
    np.testing.assert_allclose(r0["losses"], r_single["losses"], rtol=2e-4)
    np.testing.assert_allclose(r0["param_checksum"], r_single["param_checksum"], rtol=2e-4)
    # both workers observe the same replicated state
    np.testing.assert_allclose(r1["losses"], r0["losses"], rtol=1e-6)
    np.testing.assert_allclose(r1["param_checksum"], r0["param_checksum"], rtol=1e-6)


@pytest.mark.slow
def test_two_process_streaming_matches_single_process():
    """Streaming x multi-process composition (VERDICT round-3 item 6): with a
    tiny -hbm_budget_gb forcing host->device block streaming, a 2-process x
    4-device run must produce the same losses and parameter checksum as the
    1-process x 8-device streaming run — the global block permutation is
    identical, each process only ships its local batch columns."""
    port = 29000 + (os.getpid() + 23) % 1000
    coord = ["--coordinator", f"127.0.0.1:{port}", "--nproc", "2"]
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        procs = {
            "proc0": _worker([*coord, "--pid", "0", "--stream"], d2, 4),
            "proc1": _worker([*coord, "--pid", "1", "--stream"], d2, 4),
        }
        logs = _communicate(procs)
        for name, p in procs.items():
            assert p.returncode == 0, f"{name} failed:\n{logs[name][-4000:]}"
        single = _worker(["--stream"], d1, 8)
        out, _ = single.communicate(timeout=1200)
        assert single.returncode == 0, out[-4000:]

    r_single = _result(out)
    r0 = _result(logs["proc0"])
    r1 = _result(logs["proc1"])
    assert r_single["n_devices"] == 8 and r0["n_devices"] == 8
    np.testing.assert_allclose(r0["losses"], r_single["losses"], rtol=2e-4)
    np.testing.assert_allclose(r0["param_checksum"], r_single["param_checksum"], rtol=2e-4)
    np.testing.assert_allclose(r1["losses"], r0["losses"], rtol=1e-6)


CLI_ARGS = [
    "-model=DeepSense", "-dataset=MOD_TINY", "-learn_framework=FOCAL",
    "-stage=pretrain", "-synthetic", "-synthetic_samples", "64",
    "-batch_size", "32", "-epochs", "2", "-val_epochs", "2",
    "-data_layout", "sharded", "-seed", "3", "-data_parallel", "8",
]


def _losses(log):
    train = [float(m) for m in re.findall(r"\[pretrain\] epoch \d+: train loss ([0-9.]+)", log)]
    val = [float(m) for m in re.findall(r"\[pretrain\] epoch \d+: val loss ([0-9.]+)", log)]
    return train, val


@pytest.mark.slow
def test_two_process_cli_e2e():
    """Full CLI across 2 processes sharing one output tree: KV-synced exp
    folder, sharded train data, replicated eval, KNN probe, collective orbax
    checkpoint saves. Asserts completion, matching logs, and checkpoints.

    Retries once: XLA:CPU's gloo transport creates one communicator context
    per collective clique with a hardcoded ~30s rendezvous window, and on a
    loaded single-core host the two processes occasionally skew past it
    (out of scope to fix here — real TPU pods do not use gloo). The
    loss/update parity gate is the non-flaky worker test above.
    """
    last_logs = None
    for attempt in range(2):
        port = 29000 + (os.getpid() + 7 + 131 * attempt) % 1000
        with tempfile.TemporaryDirectory() as d:
            dist = ["-dist_coordinator", f"127.0.0.1:{port}", "-dist_num_processes", "2"]

            def cli(pid):
                return subprocess.Popen(
                    [sys.executable, os.path.join(REPO, "train.py"), *CLI_ARGS, *dist,
                     "-dist_process_id", str(pid), "-output_dir", d],
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                    env=_env(4, d), cwd=d,
                )

            procs = {"proc0": cli(0), "proc1": cli(1)}
            logs = _communicate(procs)
            last_logs = logs
            if all(p.returncode == 0 for p in procs.values()):
                _check_cli_outputs(logs, d)
                return
    raise AssertionError(
        "CLI e2e failed on both attempts; proc0 tail:\n"
        + last_logs["proc0"][-2500:]
        + "\nproc1 tail:\n"
        + last_logs["proc1"][-2500:]
    )


def _check_cli_outputs(logs, d):
    t0, v0 = _losses(logs["proc0"])
    t1, v1 = _losses(logs["proc1"])
    assert t0 and v0, logs["proc0"][-2000:]
    np.testing.assert_allclose(t1, t0, rtol=1e-6)
    np.testing.assert_allclose(v1, v0, rtol=1e-6)
    # one shared experiment folder with the pretrain checkpoints
    exp = os.path.join(d, "weights", "MOD_TINY_DeepSense")
    folders = os.listdir(exp)
    assert folders == ["exp0_contrastive_FOCAL"], folders
    ckpts = os.listdir(os.path.join(exp, folders[0]))
    assert any(c.endswith("_latest") for c in ckpts), ckpts


def test_missing_process_id_fails_fast(monkeypatch):
    """Regression (round-3 review): -dist_num_processes > 1 without
    -dist_process_id must raise immediately — defaulting to 0 would make
    every worker claim process 0 and hang the coordinator rendezvous."""
    from focal_tpu.parallel import distributed

    monkeypatch.delenv("FOCAL_DIST_PROCESS_ID", raising=False)

    class A:
        dist_coordinator = "127.0.0.1:9"
        dist_num_processes = 2
        dist_process_id = None

    with pytest.raises(ValueError, match="dist_process_id"):
        distributed.maybe_initialize(A())
