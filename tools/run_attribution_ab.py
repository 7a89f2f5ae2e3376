"""Attribute the focal_tpu-vs-reference quality gap (VERDICT items r3-2, r4-1).

Round 3's non-saturating A/B (noise 3.0) measured focal_tpu at 0.85 +- 0.06
test acc vs the reference's own training at 0.49 +- 0.01 on identical
data/recipe/budget, with the gap opening during PRETRAINING (KNN probe 0.89
vs 0.61). This experiment moves focal_tpu TOWARD the reference's semantics
one deviation at a time and finds which one(s) produce the gap:

  arm `control`    focal_tpu defaults (round-3 result: ~0.85)
  arm `torch_init` focal_tpu initialised from a REFERENCE-initialised
                   DeepSense state_dict (torch kaiming_uniform convs /
                   uniform GRU / uniform linear, imported via
                   utils/torch_import) instead of flax defaults
                   (lecun_normal convs / orthogonal GRU)
  arm `init_conv`  torch init for the CONV TOWERS only (flax elsewhere)
  arm `init_gru`   torch init for the GRUs only
  arm `init_proj`  torch init for the projector MLPs only
  arm `ref_lr`     focal_tpu with -ref_lr_timing (epoch e trains at lr(e-1),
                   the reference loop's epoch-END timm stepping)
  arm `both`       torch_init + ref_lr
  arm `py_draws`   -py_aug_draws: per-batch augmenter selection drawn on the
                   host with Python random (the reference's np.random stream
                   shape, Augmenter.py:83) instead of the keyed on-device PRNG
  arm `ragged_tail` -ragged_tail: train on each epoch's final PARTIAL batch
                   like the reference BatchSeqSampler (its tail yields a
                   degenerate few-negative contrastive update per epoch,
                   multi_modal_dataloader.py:66-77); focal_tpu default drops it

Platform: --platform cpu runs f32 on CPU (the round-3 setup); --platform tpu
runs f32 on the tunneled TPU backend (the round-4+ setup — CPU arms timed out
at 4h under this host's 1-core contention; bf16 was already excluded as a
factor by the round-3 CPU-f32 control). Attribution compares focal-vs-focal,
so only within-experiment platform consistency matters; each result records
the backend the child process ACTUALLY initialised (parsed from its log).
Multi-seed. Results append to artifacts/attribution_ab.json.

Usage:
  python tools/make_parity_dataset.py --out /tmp/attr_n3 --samples 384 --noise 3.0
  python tools/run_attribution_ab.py --dir /tmp/attr_n3 --seeds 1 2 3 \
      --arms control torch_init ref_lr both init_conv init_gru init_proj \
             py_draws ragged_tail --platform tpu
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, cwd, env, log_path, timeout=14400):
    t0 = time.time()
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, cwd=cwd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           timeout=timeout)
    dt = time.time() - t0
    if p.returncode != 0:
        tail = open(log_path).read()[-3000:]
        raise RuntimeError(f"{' '.join(cmd)} failed ({p.returncode}):\n{tail}")
    return dt


def parse_metrics(log_path):
    text = open(log_path).read()
    vals = [float(m) for m in re.findall(r"[Vv]al acc:\s*([0-9.]+)", text)]
    tests = re.findall(r"[Tt]est acc:\s*([0-9.]+),\s*test f1:\s*([0-9.]+)", text)
    best = max(range(len(vals)), key=lambda i: vals[i])
    return {
        "best_val_acc": vals[best],
        "test_acc": float(tests[best][0]),
        "test_f1": float(tests[best][1]),
    }


def parse_backend(log_path):
    """The backend the child ACTUALLY initialised (train.py logs it) —
    guards against a requested platform silently falling back elsewhere."""
    m = re.search(r"= Backend: (\S+)", open(log_path).read())
    return m.group(1) if m else None


def knn_plateau(log_path):
    """Max pretrain-probe val acc over the last half of the run."""
    vals = [float(m) for m in re.findall(r"[Vv]al acc:\s*([0-9.]+)", open(log_path).read())]
    if not vals:
        return None
    half = vals[len(vals) // 2:]
    return max(half)


# top-level param-tree key prefixes per init sub-component (DeepSense;
# models/deepsense.py setup() names)
INIT_COMPONENTS = {
    "conv": ("loc_mod_extractor_", "mod_extractor_"),
    "gru": ("recurrent_",),
    "proj": ("mod_projector_",),
}

# leaf-level refinements of the `proj` component: torch Linear init differs
# from flax Dense in BOTH the kernel distribution (kaiming_uniform(a=sqrt(5))
# vs lecun_normal) AND the bias (U(-1/sqrt(f), 1/sqrt(f)) vs zeros); these
# arms isolate which half carries the effect
INIT_LEAF_COMPONENTS = {
    "proj_kernel": ("mod_projector_", "kernel"),
    "proj_bias": ("mod_projector_", "bias"),
}


def make_torch_init_checkpoint(recipe, out_dir, torch_seed, components=None):
    """Reference-initialised DeepSense -> flax params checkpoint.

    Builds the reference's own model class (torch default inits: conv
    kaiming_uniform(a=sqrt(5)), GRU/Linear U(-1/sqrt(f), 1/sqrt(f))), then
    maps the state_dict into this framework's param tree via the certified
    torch importer (utils/torch_import, <=1e-4 forward parity).

    components=None replaces the WHOLE tree (the `torch_init` arm). A list of
    INIT_COMPONENTS keys replaces only those top-level subtrees, keeping the
    flax init — drawn from jax.random.key(torch_seed), i.e. bit-identical to
    what the control arm's training run initialises at -seed torch_seed —
    everywhere else, so each sub-arm isolates one component's init."""
    import types

    import torch

    from focal_tpu.params.yaml_utils import load_yaml
    from focal_tpu.utils.reference_loader import import_reference

    cfg = load_yaml(recipe)
    ref_args = types.SimpleNamespace(
        dataset_config=cfg, device="cpu", task="vehicle_classification",
        train_mode="contrastive", learn_framework="FOCAL", stage="pretrain",
        model="DeepSense", dataset="MOD", tag="",
    )
    torch.manual_seed(torch_seed)
    backbone = import_reference("models.DeepSense").DeepSense(ref_args)
    sd = backbone.state_dict()

    import jax

    # this machine's sitecustomize force-sets the TPU backend after the shell
    # env; the config API wins (see .claude/skills/verify) — the init import
    # must not touch the (possibly busy) TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from focal_tpu.models import build_backbone
    from focal_tpu.ops import build_augmenter
    from focal_tpu.train import checkpoint as ckpt
    from focal_tpu.train.state import init_state
    from focal_tpu.utils.torch_import import import_deepsense_state_dict

    args = types.SimpleNamespace(
        dataset_config=cfg, task="vehicle_classification", train_mode="contrastive",
        learn_framework="FOCAL", stage="pretrain", model="DeepSense", dataset="MOD",
        tag="", compute_dtype="float32", mixup_labels=False, prng_impl=None,
    )
    model = build_backbone(args)
    augmenter = build_augmenter(args)
    rng = np.random.default_rng(0)
    sample = jax.jit(augmenter.no)({
        "shake": {
            m: jnp.asarray(rng.normal(size=(2, 1, cfg["num_segments"],
                                            cfg["loc_mod_spectrum_len"]["shake"][m])).astype(np.float32))
            for m in cfg["modality_names"]
        }
    })
    # key(torch_seed): the flax baseline must equal the control run's own
    # init at -seed torch_seed (loops._epoch_rng), so selective arms replace
    # ONLY the named component relative to control
    state = init_state(args, model, sample, optax.identity(), jax.random.key(torch_seed))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    params, stats = import_deepsense_state_dict(sd, variables, cfg)
    suffix = "" if components is None else "_" + "_".join(sorted(components))
    if components is not None:
        prefixes = tuple(
            p for c in components if c in INIT_COMPONENTS for p in INIT_COMPONENTS[c]
        )
        leaf_rules = [INIT_LEAF_COMPONENTS[c] for c in components
                      if c in INIT_LEAF_COMPONENTS]
        unknown = [c for c in components
                   if c not in INIT_COMPONENTS and c not in INIT_LEAF_COMPONENTS]
        if unknown:
            raise ValueError(f"unknown init components: {unknown}")

        def merge_leaves(flax_sub, torch_sub, leaf_name):
            """Replace only leaves named leaf_name (e.g. 'kernel'), keeping
            the rest of the subtree flax-initialised."""
            out = {}
            for k, v in flax_sub.items():
                if isinstance(v, dict):
                    out[k] = merge_leaves(v, torch_sub[k], leaf_name)
                elif k == leaf_name:
                    out[k] = torch_sub[k]
                else:
                    out[k] = v
            return out

        def merge(flax_tree, torch_tree):
            out = {}
            for k in flax_tree:
                if prefixes and k.startswith(prefixes):
                    out[k] = torch_tree[k]
                    continue
                v = flax_tree[k]
                for top_prefix, leaf_name in leaf_rules:
                    if k.startswith(top_prefix) and isinstance(v, dict):
                        v = merge_leaves(v, torch_tree[k], leaf_name)
                out[k] = v
            return out

        params = merge(dict(state.params), dict(params))
        stats = merge(dict(state.batch_stats), dict(stats))
    path = os.path.join(out_dir, f"torch_init_s{torch_seed}{suffix}")
    ckpt.save_params(path, params, stats)
    return path


ARM_FLAGS = {
    "control": [],
    "torch_init": ["@init"],
    "init_conv": ["@init:conv"],
    "init_gru": ["@init:gru"],
    "init_proj": ["@init:proj"],
    "ref_lr": ["-ref_lr_timing"],
    "both": ["@init", "-ref_lr_timing"],
    "py_draws": ["-py_aug_draws"],
    "ragged_tail": ["-ragged_tail"],
    "init_proj_kernel": ["@init:proj_kernel"],
    "init_proj_bias": ["@init:proj_bias"],
    # every reproduced reference-loop deviation at once: torch init +
    # epoch-END lr timing + the sampler's ragged tail batches — how close
    # does focal_tpu get to the reference's own 0.49?
    "ref_like": ["@init", "-ref_lr_timing", "-ragged_tail"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="output of make_parity_dataset.py")
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--arms", nargs="+", default=["torch_init", "ref_lr", "both"])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="backend for the focal arms. Attribution compares focal-vs-"
                    "focal, so only WITHIN-experiment consistency matters; tpu runs "
                    "orders of magnitude faster on this host (the CPU torch_init arm "
                    "timed out at 4h under contention). All arms force float32 either "
                    "way (bf16 was excluded by the round-3 CPU-f32 control).")
    a = ap.parse_args()

    d = os.path.abspath(a.dir)
    recipe = os.path.join(d, "run", "data", "MOD.yaml")
    results_path = os.path.join(REPO, "artifacts", "attribution_ab.json")
    results = {}
    if os.path.exists(results_path):
        results = json.load(open(results_path))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    if a.platform == "cpu":
        env["FOCAL_PLATFORM"] = "cpu"
    else:
        # this host's TPU registers as the tunneled "axon" backend and the
        # sitecustomize already selects it; forcing jax_platforms="tpu" would
        # fail with "No jellyfish device found" — leave the default alone.
        env.pop("FOCAL_PLATFORM", None)
        env.pop("JAX_PLATFORMS", None)

    for seed in a.seeds:
        init_paths = {}
        for arm in a.arms:
            key = f"{arm}_s{seed}" + ("" if a.platform == "cpu" else f"_{a.platform}")
            if key in results:
                print(f"skip {key} (already done)", flush=True)
                continue
            flags = list(ARM_FLAGS[arm])
            init_flags = []
            for f in list(flags):
                if not f.startswith("@init"):
                    continue
                flags.remove(f)
                components = None if f == "@init" else [f.split(":", 1)[1]]
                ckey = "full" if components is None else components[0]
                if ckey not in init_paths:
                    init_paths[ckey] = make_torch_init_checkpoint(
                        recipe, d, seed, components=components
                    )
                init_flags = ["-init_weight", init_paths[ckey]]
            out = os.path.join(d, f"focal_{key}")
            base = [sys.executable, os.path.join(REPO, "train.py"), "-model=DeepSense",
                    "-learn_framework=FOCAL", "-dataset_config", recipe,
                    "-compute_dtype", "float32",
                    "-output_dir", out, "-seed", str(seed), *flags]
            pre_log = os.path.join(d, f"focal_{key}_pretrain.log")
            ft_log = os.path.join(d, f"focal_{key}_finetune.log")
            t_pre = run(base + ["-stage=pretrain", *init_flags], d, env, pre_log)
            t_ft = run(base + ["-stage=finetune"], d, env, ft_log)
            results[key] = {
                **parse_metrics(ft_log),
                "knn_plateau": knn_plateau(pre_log),
                "pretrain_s": round(t_pre, 1), "finetune_s": round(t_ft, 1),
                "backend": parse_backend(pre_log),
            }
            os.makedirs(os.path.dirname(results_path), exist_ok=True)
            with open(results_path, "w") as f:
                json.dump(results, f, indent=2)
                f.write("\n")
            print(json.dumps({key: results[key]}), flush=True)

    print("\n| Arm | KNN plateau | best val acc | test acc | test F1 |")
    print("|---|---|---|---|---|")
    for name, r in sorted(results.items()):
        print(f"| {name} | {r.get('knn_plateau')} | {r['best_val_acc']:.4f} "
              f"| {r['test_acc']:.4f} | {r['test_f1']:.4f} |")


if __name__ == "__main__":
    main()
