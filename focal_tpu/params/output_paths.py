"""Experiment folder management.

Reproduces the reference UX (reference: src/params/output_paths.py:28-207):
auto-incrementing ``weights/{dataset}_{model}/exp{N}_{suffix}/`` folders, a
config snapshot (``model_config.json`` + ``learn_framework_config.json``),
per-stage log files, and best/latest checkpoint naming — with orbax-backed
checkpoint directories instead of ``.pt`` files.
"""

import json
import logging
import os


def _root(args):
    """Root directory holding weights/ and result/ trees."""
    if getattr(args, "output_dir", None):
        return args.output_dir
    # reference puts weights/ next to (one level above) the src dir; we use CWD
    return os.getcwd()


def check_paths(path_list):
    for p in path_list:
        os.makedirs(p, exist_ok=True)


def set_model_weight_suffix(train_mode, learn_framework=None, task=None, label_ratio=None, tag=None):
    if train_mode == "supervised":
        suffix = f"supervised_{task}_{label_ratio}"
    elif train_mode in {"contrastive"}:
        suffix = f"{train_mode}_{learn_framework}"
    else:
        raise ValueError(f"Unknown train mode: {train_mode}")
    if tag is not None:
        suffix += f"-{tag}"
    return suffix


def find_most_recent_weight(args, return_suffix=False):
    """Find the newest exp{N}_{suffix} folder matching the run config."""
    dataset_model_path = os.path.join(_root(args), "weights", f"{args.dataset}_{args.model}")
    suffix = set_model_weight_suffix(
        args.train_mode, args.learn_framework, args.task, args.label_ratio, tag=args.tag
    )
    newest_id, newest_weight = -1, None
    if os.path.isdir(dataset_model_path):
        for weight in os.listdir(dataset_model_path):
            weight_suffix = weight.split("_", 1)[-1]
            if weight_suffix != suffix or not weight.startswith("exp"):
                continue
            try:
                weight_id = int(weight.split("_")[0][3:])
            except ValueError:
                continue
            if weight_id > newest_id:
                newest_id = weight_id
                newest_weight = os.path.join(dataset_model_path, weight)
    if return_suffix:
        return newest_id, newest_weight, suffix
    return newest_id, newest_weight


def _sync_weight_folder(weight_folder):
    """Multi-process runs must agree on ONE experiment folder: the exp{N}
    auto-increment is a filesystem race between processes (each would mint
    its own folder and orbax's cross-process save barrier then deadlocks).
    Process 0's choice is published through the jax.distributed KV store."""
    import jax

    if jax.process_count() <= 1:
        return weight_folder
    client = jax._src.distributed.global_state.client
    if client is None:
        return weight_folder
    key = "focal_tpu/weight_folder"  # one stage per process lifetime
    if jax.process_index() == 0:
        client.key_value_set(key, weight_folder)
        return weight_folder
    return client.blocking_key_value_get(key, 120_000)


def set_model_weight_folder(args):
    dataset_model_path = os.path.join(_root(args), "weights", f"{args.dataset}_{args.model}")
    check_paths([dataset_model_path])

    newest_id, newest_weight, suffix = find_most_recent_weight(args, return_suffix=True)

    if args.option == "test" or args.stage == "finetune" or getattr(args, "resume", False):
        # reuse an existing folder (explicit, or the most recent match)
        if args.model_weight is not None:
            weight_folder = args.model_weight
        elif newest_weight is not None:
            weight_folder = newest_weight
        else:
            raise FileNotFoundError(f"No existing model weights for {suffix}")
        weight_folder = _sync_weight_folder(weight_folder)
    else:
        weight_folder = os.path.join(dataset_model_path, f"exp{newest_id + 1}_{suffix}")
        weight_folder = _sync_weight_folder(weight_folder)
        check_paths([weight_folder])
        with open(os.path.join(weight_folder, "model_config.json"), "w") as f:
            json.dump(args.dataset_config[args.model], f, indent=4)
        if args.train_mode != "supervised" and args.stage == "pretrain":
            with open(os.path.join(weight_folder, "learn_framework_config.json"), "w") as f:
                json.dump(args.dataset_config[args.learn_framework], f, indent=4)

    if args.option == "train":
        if args.train_mode == "supervised":
            log_name = "train_log.txt"
        elif args.stage == "pretrain":
            log_name = "pretrain_log.txt"
        else:
            log_name = f"{args.task}_{args.label_ratio}_{args.stage}_log.txt"
        args.train_log_file = os.path.join(weight_folder, log_name)
        if os.path.exists(args.train_log_file):
            os.remove(args.train_log_file)
        logging.basicConfig(
            level=logging.INFO,
            handlers=[logging.FileHandler(args.train_log_file), logging.StreamHandler()],
            force=True,
        )
        logging.info(f"=\t[Model weights path]: {weight_folder}")

    args.weight_folder = weight_folder
    return args


def checkpoint_paths(args, stage=None):
    """Return (best, latest) checkpoint directories for the current stage."""
    if args.train_mode == "supervised":
        base = f"{args.dataset}_{args.model}_{args.task}"
    elif stage == "pretrain" or (stage is None and args.stage == "pretrain"):
        base = f"{args.dataset}_{args.model}_pretrain"
    else:
        base = f"{args.dataset}_{args.model}_{args.task}_{args.label_ratio}_finetune"
    best = os.path.join(args.weight_folder, f"{base}_best")
    latest = os.path.join(args.weight_folder, f"{base}_latest")
    return best, latest


def set_model_weight_file(args):
    """Checkpoint selected for evaluation (reference: output_paths.py:165-199)."""
    args.classifier_weight, _ = checkpoint_paths(args)
    return args


def set_output_paths(args):
    result_root = os.path.join(_root(args), "result")
    args.log_path = os.path.join(result_root, "log", f"{args.dataset}_{args.model}_{args.train_mode}")
    check_paths([args.log_path])
    return args
