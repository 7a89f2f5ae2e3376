"""Benchmark: FOCAL pretrain throughput (windows/sec/chip) on MOD shapes.

Prints one JSON line PER MODEL (DeepSense, then SW_Transformer):
  {"metric": "...", "value": N, "unit": "windows/s/chip", "vs_baseline": N}
Set BENCH_MODEL to restrict to one model.

The measured workload is the full jitted pretrain step at the reference batch
size (256 two-second windows per step: two random-augmented views -> FFT ->
backbone -> 4-term FOCAL loss -> AdamW update), on synthetic MOD-shaped data
resident in device memory.

vs_baseline divides by the ACTUAL reference implementation — the PyTorch
modules imported from /root/reference/src (models.DeepSense /
models.SW_Transformer wrapped in models.FOCALModules.FOCAL, with the real
4-term models.loss.FOCALLoss and AdamW) — measured on this host's CPU (the
reference is torch; no GPU exists here). Two deviations from the reference
train loop, both cheap relative to the model step: the two augmented views
use scaling/negation (members of the reference pool; the tsai warp
augmenters aren't installed), and the FFT is applied with the same
layout/semantics as reference src/data_augmenter/Augmenter.py:141-158. The
torch numbers are cached in .bench_baseline.json so repeat runs are cheap.
If torch is unavailable the ratio falls back to 1.0.
"""

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
# alternate recipe (e.g. MOD_WIDE, the 4x-width production-scale config);
# the metric name and the torch-baseline cache key carry the dataset suffix
DATASET = os.environ.get("BENCH_DATASET", "MOD")
# 50 steps ~ 350 ms of measured compute for DeepSense: enough signal that
# run-to-run variance stays within a few percent
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")
# CPU torch baselines: windows/s is batch-insensitive on CPU at these sizes;
# smaller batches keep the one-off baseline measurement tractable
BASELINE_STEPS = int(os.environ.get("BENCH_BASELINE_STEPS", "10"))
BASELINE_BATCH = {"DeepSense": 64, "SW_Transformer": 16}

# bf16 peak TFLOP/s per chip by device kind (densest matmul path). Override
# with BENCH_PEAK_TFLOPS when the kind is missing or the tunnel reports an
# unexpected name.
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v5": 459.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
    "TPU v6e": 918.0,
}


def _peak_tflops(device):
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    return PEAK_TFLOPS.get(device.device_kind)


def _step_flops(step, *example_args):
    """FLOPs of ONE compiled train step, from XLA's cost model of the
    optimized HLO (the audit trail the reference's hand-written counters at
    src/models/SwinModules.py:157-168,351-363,407-411,560-565 approximate).
    Counts the WHOLE program: both augmented views, FFT, backbone fwd+bwd,
    loss, and the AdamW update."""
    try:
        ca = step.lower(*example_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return None


def bench_jax(model_name):
    if os.environ.get("FOCAL_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["FOCAL_PLATFORM"])
    from focal_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _make_args
    from focal_tpu.data.synthetic import make_synthetic_dataset
    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated
    from focal_tpu.train.losses import make_focal_loss
    from focal_tpu.train.optim import build_optimizer
    from focal_tpu.train.state import init_state
    from focal_tpu.train.steps import make_pretrain_step

    t_phase = time.perf_counter()

    def phase(name):
        nonlocal t_phase
        now = time.perf_counter()
        print(f"[bench:{model_name}] {name}: {now - t_phase:.1f}s", file=sys.stderr)
        t_phase = now

    n_chips = len(jax.devices())
    mesh_plan = make_mesh_plan(0)
    phase("devices")

    argv = [
        "-dataset", DATASET, "-model", model_name,
        "-learn_framework", "FOCAL", "-stage", "pretrain", "-synthetic",
        "-compute_dtype", os.environ.get("BENCH_DTYPE", "bfloat16"),
    ]
    if os.environ.get("FOCAL_NO_PALLAS_BLOCK"):  # A/B the whole-block kernel
        argv.append("-no_pallas_block")
    if os.environ.get("FOCAL_PALLAS_CONV"):  # A/B the fused conv towers
        argv.append("-pallas_conv")
    if os.environ.get("FOCAL_PALLAS_MLP"):  # A/B the fused Swin MLP
        argv.append("-pallas_mlp")
    args = _make_args(argv)
    seq_len = args.dataset_config["seq_len"]
    model = build_backbone(args)
    augmenter = build_augmenter(args)
    ds = make_synthetic_dataset(args.dataset_config, args.task, max(BATCH, 512), seed=0, seq_len=seq_len)
    phase("synthetic data")
    data = put_replicated(
        {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in ds.data.items()},
        mesh_plan,
    )
    sample = jax.jit(augmenter.no)(
        {loc: {m: jnp.asarray(a[:2]) for m, a in mods.items()} for loc, mods in ds.data.items()}
    )
    phase("device put + sample fft")
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    phase("model init")
    tx, _ = build_optimizer(args, state.params, steps_per_epoch=100)
    state = state.replace(tx=tx, opt_state=jax.jit(tx.init)(state.params))
    state = put_replicated(state, mesh_plan)
    phase("optimizer init")

    focal_loss = make_focal_loss(args)
    step = make_pretrain_step(model, augmenter, focal_loss, mesh_plan)

    idx_host = (jnp.arange(BATCH, dtype=jnp.int32) % len(ds))
    if mesh_plan is not None:
        idx_host = jax.device_put(idx_host, mesh_plan.batch_sharded)
    rng = jax.random.key(1)

    # warmup / compile; sync via a VALUE fetch — on this machine's experimental
    # backend block_until_ready can return before execution finishes, which
    # silently inflates throughput numbers.
    #
    # Warm up until the per-step time STABILIZES, not a fixed count: on the
    # tunneled TPU the first executions after compile run orders of magnitude
    # slower (measured: 64s first step, ~41s for the next four, then a cliff
    # to steady state). A fixed 3-step warmup let that tail leak into the
    # timed loop and recorded a 2.5x-low SW number in BENCH_r03 (1,829 w/s vs
    # the 4,6xx steady state this same code reaches).
    warm_times = []
    for w in range(int(os.environ.get("BENCH_MAX_WARMUP", "40"))):
        t = time.perf_counter()
        state, metrics = step(state, data, idx_host, rng)
        float(jax.device_get(metrics["loss"]))
        warm_times.append(time.perf_counter() - t)
        if len(warm_times) >= 6 and max(warm_times[-3:]) < 1.3 * min(warm_times):
            break
    print(
        f"[bench:{model_name}] warmup steps: {len(warm_times)}, per-step ms "
        f"tail: {[round(x * 1e3, 1) for x in warm_times[-5:]]}",
        file=sys.stderr,
    )
    phase("step compile + warmup")

    # measurement: several independent chained passes; the metric is the BEST
    # pass (one-off host/tunnel stalls only ever slow a pass down). All pass
    # values go to the JSON line so variance is auditable.
    passes = []
    for _ in range(int(os.environ.get("BENCH_PASSES", "3"))):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = step(state, data, idx_host, rng)
        final_loss = float(jax.device_get(metrics["loss"]))
        passes.append(time.perf_counter() - t0)
    dt = min(passes)
    print(
        f"[bench:{model_name}] pass ms/step: {[round(p / STEPS * 1e3, 2) for p in passes]}",
        file=sys.stderr,
    )
    phase("timing")

    # FLOPs accounting AFTER the timed passes: the all-XLA-variant lowering
    # below costs an extra compile, and compiles between warmup and timing
    # perturbed the measured loop in earlier rounds.
    flops_per_step = _step_flops(step, state, data, idx_host, rng)
    flops_source = "cost_model"
    # XLA's cost model assigns ZERO FLOPs to custom calls, so with pallas
    # kernels active the step's count omits the in-kernel qkv/attention/proj
    # work and the MFU would understate reality. Lower the SAME step with the
    # all-XLA module variant (identical math and param tree) and use its
    # complete count as the model cost. Costs one extra compile; skip with
    # BENCH_SKIP_XLA_FLOPS=1.
    if getattr(model, "use_pallas", False) and not os.environ.get("BENCH_SKIP_XLA_FLOPS"):
        clone_kw = {"use_pallas": False}
        for extra in ("use_pallas_block", "use_pallas_mlp"):
            if hasattr(model, extra):
                clone_kw[extra] = False
        xla_model = model.clone(**clone_kw)
        xla_step = make_pretrain_step(xla_model, augmenter, focal_loss, mesh_plan)
        xla_flops = _step_flops(xla_step, state, data, idx_host, rng)
        if xla_flops:
            flops_per_step = xla_flops
            flops_source = "all_xla_variant"
    phase("cost analysis")

    windows_per_sec = BATCH * STEPS / dt
    perf = {
        "pass_windows_per_sec": [round(BATCH * STEPS / p / n_chips, 2) for p in passes],
        "warmup_steps": len(warm_times),
        # machine-visible droop marker (BENCH_r04 pass 3 ran 25% slow): any
        # timed pass >1.5x the best one is flagged so scoreboard variance is
        # auditable without re-deriving it from the pass list
        "slow_passes": [i for i, p in enumerate(passes) if p > 1.5 * min(passes)],
        "pass_spread": round(max(passes) / min(passes), 4),
    }
    if flops_per_step:
        perf["flops_source"] = flops_source
        perf["flops_per_window"] = flops_per_step / BATCH
        perf["achieved_tflops"] = flops_per_step * STEPS / dt / n_chips / 1e12
        peak = _peak_tflops(jax.devices()[0])
        if peak:
            perf["mfu"] = perf["achieved_tflops"] / peak
    return windows_per_sec / n_chips, n_chips, final_loss, perf


def bench_torch_baseline(model_name):
    """The reference implementation's pretrain step (CPU), cached per model."""
    key = f"reference_windows_per_sec_{model_name.lower()}"
    if DATASET != "MOD":
        key += f"_{DATASET.lower()}"
    cached = {}
    if os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                cached = json.load(f)
            if key in cached:
                return cached[key]
        except Exception:
            cached = {}
    try:
        value = _measure_reference(model_name)
    except Exception as e:
        print(f"torch baseline unavailable: {e}", file=sys.stderr)
        return None
    cached[key] = value
    with open(CACHE, "w") as f:
        json.dump(cached, f)
    return value


def _measure_reference(model_name, steps=None, batch=None):
    """One real reference FOCAL pretrain step, timed on CPU.

    Imports the reference's own modules (backbone + FOCAL wrapper + 4-term
    FOCALLoss; reference: src/models/DeepSense.py:11, SW_Transformer.py:17,
    FOCALModules.py:4, loss.py:139) and steps AdamW with the reference
    pretrain hyperparameters (src/data/MOD.yaml pretrain_optimizer).
    """
    import torch
    import yaml
    from types import SimpleNamespace

    from focal_tpu.utils.reference_loader import REF_SRC, import_reference

    steps = steps or BASELINE_STEPS
    batch = batch or BASELINE_BATCH[model_name]
    torch.manual_seed(0)

    if DATASET == "MOD":
        with open(os.path.join(REF_SRC, "data", "MOD.yaml")) as f:
            cfg = yaml.safe_load(f)
    else:
        # schema-compatible alternate recipe (e.g. MOD_WIDE): feed it to the
        # reference's own modules so vs_baseline compares equal-width models
        from focal_tpu.params.yaml_utils import load_dataset_config

        cfg = load_dataset_config(DATASET)
        batch = max(4, batch // 4)  # 4x-width torch-CPU steps are slow
    args = SimpleNamespace(
        dataset_config=cfg,
        device="cpu",
        task="vehicle_classification",
        train_mode="contrastive",
        learn_framework="FOCAL",
        stage="pretrain",
        model=model_name,
        dataset="MOD",
        tag="",
    )

    backbone_cls = import_reference(f"models.{model_name}").__dict__[model_name]
    FOCAL = import_reference("models.FOCALModules").FOCAL
    FOCALLoss = import_reference("models.loss").FOCALLoss

    backbone = backbone_cls(args)
    model = FOCAL(args, backbone)
    model.train()
    loss_fn = FOCALLoss(args)
    opt_cfg = cfg["FOCAL"]["pretrain_optimizer"]
    wd = opt_cfg["weight_decay"]
    if isinstance(wd, dict):
        wd = wd[model_name]
    opt = torch.optim.AdamW(model.parameters(), lr=opt_cfg["start_lr"], weight_decay=wd)

    # time-domain batch at MOD shapes (c=1 channel, i=10 intervals)
    xa = torch.randn(batch, 1, 10, 1600)
    xs = torch.randn(batch, 1, 10, 20)

    def fft2ch(x):
        # reference fft_preprocess layout (src/data_augmenter/Augmenter.py:141-158)
        f = torch.fft.fft(x, dim=-1)
        v = torch.view_as_real(f).permute(0, 1, 4, 2, 3)
        b, c1, c2, i, s = v.shape
        return v.reshape(b, c1 * c2, i, s)

    def views(x):
        # scaling and negation: members of the reference MOD random pool
        # (src/data/MOD.yaml random_augmenters; tsai warps not installed)
        v1 = fft2ch(x * (1.0 + 0.2 * torch.randn(1)))
        v2 = fft2ch(-x if torch.rand(1) < 0.5 else x)
        return v1, v2

    def one_step():
        opt.zero_grad()
        a1, a2 = views(xa)
        s1, s2 = views(xs)
        in1 = {"shake": {"audio": a1, "seismic": s1}}
        in2 = {"shake": {"audio": a2, "seismic": s2}}
        f1, f2 = model(in1, in2, proj_head=True)
        loss = loss_fn(f1, f2)
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    only = os.environ.get("BENCH_MODEL")
    models = [only] if only else ["DeepSense", "SW_Transformer"]
    for model_name in models:
        value, n_chips, loss, perf = bench_jax(model_name)
        baseline = bench_torch_baseline(model_name)
        vs = value / baseline if baseline else 1.0
        line = {
            "metric": f"focal_pretrain_{model_name.lower()}_{DATASET.lower()}_throughput",
            "value": round(value, 2),
            "unit": "windows/s/chip",
            "vs_baseline": round(vs, 2),
        }
        if "flops_per_window" in perf:
            line["flops_per_window"] = round(perf["flops_per_window"])
            line["achieved_tflops"] = round(perf["achieved_tflops"], 3)
        if "mfu" in perf:
            line["mfu"] = round(perf["mfu"], 4)
        if "flops_source" in perf:
            line["flops_source"] = perf["flops_source"]
        line["pass_windows_per_sec"] = perf.get("pass_windows_per_sec")
        line["warmup_steps"] = perf.get("warmup_steps")
        line["pass_spread"] = perf.get("pass_spread")
        if perf.get("slow_passes"):
            line["slow_passes"] = perf["slow_passes"]
        print(json.dumps(line))


if __name__ == "__main__":
    main()
