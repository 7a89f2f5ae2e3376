"""Benchmark: FOCAL pretrain throughput (windows/sec/chip) on MOD shapes.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "windows/s/chip", "vs_baseline": N}

The measured workload is the full jitted pretrain step on the flagship
DeepSense backbone at the reference batch size (256 two-second windows per
step: two random-augmented views -> FFT -> backbone -> 4-term FOCAL loss ->
AdamW update), on synthetic MOD-shaped data resident in device memory.

vs_baseline compares against an equivalent PyTorch implementation of the same
step measured on this host's CPU (the reference is torch; no GPU exists
here). The torch number is cached in .bench_baseline.json so repeat runs are
cheap. If torch is unavailable the ratio falls back to 1.0.
"""

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
# 50 steps ~ 350 ms of measured compute for DeepSense: enough signal that
# run-to-run variance stays within a few percent
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")


def bench_jax():
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
        print(f"[bench] {name}: {now - t_phase:.1f}s", file=sys.stderr)
        t_phase = now

    n_chips = len(jax.devices())
    mesh_plan = make_mesh_plan(0)
    phase("devices")

    args = _make_args(
        [
            "-dataset", "MOD", "-model", os.environ.get("BENCH_MODEL", "DeepSense"),
            "-learn_framework", "FOCAL", "-stage", "pretrain", "-synthetic",
            "-compute_dtype", os.environ.get("BENCH_DTYPE", "bfloat16"),
        ]
    )
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
    # silently inflates throughput numbers
    for _ in range(3):
        state, metrics = step(state, data, idx_host, rng)
    float(jax.device_get(metrics["loss"]))
    phase("step compile + warmup")

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, data, idx_host, rng)
    final_loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    windows_per_sec = BATCH * STEPS / dt
    return windows_per_sec / n_chips, n_chips, final_loss


def bench_torch_baseline():
    """Equivalent pretrain step in PyTorch (CPU) for the vs_baseline ratio,
    matched to BENCH_MODEL and cached per model."""
    model = os.environ.get("BENCH_MODEL", "DeepSense")
    key = f"torch_windows_per_sec_{model.lower()}"
    cached = {}
    if os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                cached = json.load(f)
            # legacy single-key cache was the DeepSense number
            if "torch_windows_per_sec" in cached and "torch_windows_per_sec_deepsense" not in cached:
                cached["torch_windows_per_sec_deepsense"] = cached.pop("torch_windows_per_sec")
            if key in cached:
                return cached[key]
        except Exception:
            cached = {}
    try:
        value = _measure_torch_swin() if model == "SW_Transformer" else _measure_torch()
    except Exception as e:
        print(f"torch baseline unavailable: {e}", file=sys.stderr)
        return None
    cached[key] = value
    with open(CACHE, "w") as f:
        json.dump(cached, f)
    return value


def _measure_torch_swin(steps=2, batch=None):
    """Torch counterpart of the SW_Transformer pretrain step (CPU): window
    attention towers at the MOD geometry + contrastive loss."""
    import torch
    import torch.nn as nn

    batch = batch or BATCH
    torch.manual_seed(0)

    class TorchWindowBlock(nn.Module):
        def __init__(self, dim, res, heads=4, window=3, shift=0):
            super().__init__()
            self.dim, self.res, self.heads, self.window, self.shift = dim, res, heads, window, shift
            self.norm1 = nn.LayerNorm(dim)
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(), nn.Linear(4 * dim, dim))
            self.bias = nn.Parameter(torch.zeros(heads, window * window, window * window))

        def forward(self, x):
            H, W = self.res
            B, L, C = x.shape
            s = self.norm1(x).view(B, H, W, C)
            if self.shift:
                s = torch.roll(s, (-self.shift, -self.shift), (1, 2))
            w = self.window
            s = s.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
            qkv = self.qkv(s).reshape(-1, w * w, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5 + self.bias[None]
            o = (attn.softmax(-1) @ v).transpose(1, 2).reshape(-1, w * w, C)
            o = self.proj(o)
            o = o.view(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
            if self.shift:
                o = torch.roll(o, (self.shift, self.shift), (1, 2))
            x = x + o.reshape(B, L, C)
            return x + self.mlp(self.norm2(x))

    class TorchSwinTower(nn.Module):
        def __init__(self, in_c, img, patch):
            super().__init__()
            self.embed = nn.Conv2d(in_c, 64, patch, stride=patch)
            res = (img[0] // patch[0], img[1] // patch[1])
            self.stages = nn.ModuleList()
            self.merges = nn.ModuleList()
            dims = [64, 128, 256]
            depths = [2, 2, 4]
            for i, (d, dep) in enumerate(zip(dims, depths)):
                r = (res[0] >> i, res[1] >> i)
                self.stages.append(
                    nn.ModuleList(
                        TorchWindowBlock(d, r, shift=(j % 2) * 1) for j in range(dep)
                    )
                )
                if i < 2:
                    self.merges.append(nn.Linear(4 * d, 2 * d))
            self.res = res
            self.head = nn.Sequential(nn.Linear(256 * (res[0] >> 2) * (res[1] >> 2), 256),
                                      nn.ReLU(), nn.Linear(256, 256))

        def forward(self, x):
            x = self.embed(x).flatten(2).transpose(1, 2)
            H, W = self.res
            for i, stage in enumerate(self.stages):
                for blk in stage:
                    x = blk(x)
                if i < 2:
                    B, L, C = x.shape
                    x = x.view(B, H, W, C)
                    x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
                    H, W = H // 2, W // 2
                    x = self.merges[i](x.view(B, H * W, 4 * C))
            return self.head(x.flatten(1))

    audio = TorchSwinTower(2, (12, 1920), (1, 40))
    seismic = TorchSwinTower(2, (12, 24), (1, 1))
    params = list(audio.parameters()) + list(seismic.parameters())
    opt = torch.optim.AdamW(params, lr=1e-3, weight_decay=0.05)

    xa = torch.randn(batch, 2, 12, 1920)
    xs = torch.randn(batch, 2, 12, 24)

    def contrastive(f1, f2, temp=0.07):
        z = torch.nn.functional.normalize(torch.cat([f1, f2], 0), dim=-1)
        sim = z @ z.T / temp
        n = f1.shape[0]
        labels = torch.cat([torch.arange(n, 2 * n), torch.arange(0, n)])
        sim.fill_diagonal_(-1e9)
        return torch.nn.functional.cross_entropy(sim, labels)

    def one_step():
        opt.zero_grad()
        loss = contrastive(audio(xa), audio(xa * 0.9)) + contrastive(seismic(xs), seismic(-xs))
        loss.backward()
        opt.step()

    one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def _measure_torch(steps=3, batch=None):
    import torch
    import torch.nn as nn

    batch = batch or BATCH
    torch.manual_seed(0)

    class TorchDeepSenseEncoder(nn.Module):
        """Same topology/dims as the MOD DeepSense recipe."""

        def __init__(self, in_c, spectrum, stride, k_in, k_mid, out_c=128, inter=4, rec=256):
            super().__init__()
            pad_mid = (0, k_mid // 2)
            pad_in = (0, 0) if stride > 1 else (0, k_in // 2)
            self.conv_in = nn.Sequential(
                nn.Conv2d(in_c, out_c // 2, (1, k_in), stride=(1, stride), padding=pad_in),
                nn.BatchNorm2d(out_c // 2), nn.GELU(), nn.Dropout2d(0.2),
            )
            self.inter = nn.ModuleList(
                nn.Sequential(
                    nn.Conv2d(out_c // 2, out_c // 2, (1, k_mid), padding=pad_mid),
                    nn.BatchNorm2d(out_c // 2), nn.GELU(), nn.Dropout2d(0.2),
                )
                for _ in range(inter)
            )
            flat = out_c // 2 * (spectrum // stride if stride > 1 else spectrum)
            self.out = nn.Conv1d(flat, out_c, 1)
            self.gru = nn.GRU(out_c, rec, 2, batch_first=True, bidirectional=True, dropout=0.2)
            self.proj = nn.Sequential(nn.Linear(2 * rec, 256), nn.ReLU(), nn.Linear(256, 256))

        def forward(self, x):
            x = self.conv_in(x)
            for layer in self.inter:
                x = x + layer(x)
            b, c, i, s = x.shape
            x = x.permute(0, 1, 3, 2).reshape(b, c * s, i)
            x = self.out(x).permute(0, 2, 1)
            x, _ = self.gru(x)
            return self.proj(x.mean(1))

    audio = TorchDeepSenseEncoder(2, 1600, 80, 80, 5)
    seismic = TorchDeepSenseEncoder(2, 20, 1, 3, 3)
    params = list(audio.parameters()) + list(seismic.parameters())
    opt = torch.optim.AdamW(params, lr=1e-3, weight_decay=0.05)

    xa = torch.randn(batch, 1, 10, 1600)
    xs = torch.randn(batch, 1, 10, 20)

    def fft2ch(x):
        f = torch.fft.fft(x, dim=-1)
        v = torch.view_as_real(f).permute(0, 1, 4, 2, 3)
        b, c1, c2, i, s = v.shape
        return v.reshape(b, c1 * c2, i, s)

    def contrastive(f1, f2, temp=0.5):
        z = torch.cat([f1, f2], 0)
        z = nn.functional.normalize(z, dim=-1)
        sim = z @ z.T / temp
        n = f1.shape[0]
        labels = torch.cat([torch.arange(n, 2 * n), torch.arange(0, n)])
        sim.fill_diagonal_(-1e9)
        return nn.functional.cross_entropy(sim, labels)

    def one_step():
        opt.zero_grad()
        loss = 0.0
        for enc, x in ((audio, xa), (seismic, xs)):
            v1 = fft2ch(x * (1 + 0.2 * torch.randn(1)))
            v2 = fft2ch(-x if torch.rand(1) < 0.5 else x)
            f1, f2 = enc(v1), enc(v2)
            loss = loss + contrastive(f1, f2)
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    value, n_chips, loss = bench_jax()
    baseline = bench_torch_baseline()
    vs = value / baseline if baseline else 1.0
    model = os.environ.get("BENCH_MODEL", "DeepSense").lower()
    print(
        json.dumps(
            {
                "metric": f"focal_pretrain_{model}_mod_throughput",
                "value": round(value, 2),
                "unit": "windows/s/chip",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
