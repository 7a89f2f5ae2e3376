"""Command-line surface.

Keeps the reference's flag set intact (reference: src/params/base_params.py:14-86)
so existing MOD launch commands run unchanged, and adds TPU-specific knobs
behind new flags (all with reference-equivalent defaults).
"""

import argparse

from focal_tpu.params.auto import set_auto_params


def positive_int(value):
    ivalue = int(value)
    if ivalue < 1:
        raise argparse.ArgumentTypeError(f"expected a positive integer, got {value}")
    return ivalue


def build_parser():
    parser = argparse.ArgumentParser(description="FOCAL-TPU")

    # ---- reference-parity flags
    parser.add_argument("-tag", type=str, default=None, help="Execution tag, for record only.")
    parser.add_argument("-dataset", type=str, default="MOD", help="Dataset to train/evaluate on.")
    parser.add_argument("-task", type=str, default=None, help="Downstream task.")
    parser.add_argument(
        "-model", type=str, default="SW_Transformer", help="Backbone: DeepSense | SW_Transformer."
    )
    parser.add_argument(
        "-learn_framework", type=str, default="no", help="Learning framework: FOCAL | no."
    )
    parser.add_argument(
        "-stage", type=str, default="pretrain", help="pretrain | finetune (contrastive only)."
    )
    parser.add_argument(
        "-label_ratio", type=float, default=1.0, help="Ratio of labeled data for supervised/finetune."
    )
    parser.add_argument("-model_weight", type=str, default=None, help="Checkpoint dir to evaluate/finetune.")
    parser.add_argument("-batch_size", type=int, default=None, help="Global batch size.")
    parser.add_argument(
        "-gpu", type=str, default="0", help="Accepted for CLI parity; device selection is JAX-native."
    )

    # ---- TPU-framework flags (new)
    parser.add_argument(
        "-dataset_config",
        dest="dataset_config_path",
        type=str,
        default=None,
        help="Explicit path to the dataset recipe yaml.",
    )
    parser.add_argument(
        "-compute_dtype",
        type=str,
        default=None,
        choices=["float32", "bfloat16"],
        help="Activation/matmul dtype on device (params always float32). "
        "Default: bfloat16 on TPU (8-20x faster per step), float32 elsewhere.",
    )
    parser.add_argument(
        "-prng_impl",
        type=str,
        default=None,
        choices=["threefry2x32", "rbg"],
        help="JAX PRNG implementation. Default: rbg on TPU (hardware "
        "generator — threefry dropout masks cost ~25%% of a train step), "
        "threefry2x32 elsewhere.",
    )
    parser.add_argument(
        "-epochs", type=int, default=None, help="Override the number of training epochs from the recipe."
    )
    parser.add_argument(
        "-synthetic",
        action="store_true",
        help="Train on a deterministic synthetic dataset shaped like the recipe (no files needed).",
    )
    parser.add_argument(
        "-synthetic_samples", type=int, default=512, help="Synthetic dataset size (train split)."
    )
    parser.add_argument(
        "-data_parallel",
        type=int,
        default=0,
        help="Number of devices on the data mesh axis (0 = all local devices).",
    )
    parser.add_argument(
        "-model_parallel",
        type=int,
        default=1,
        help="Tensor-parallel ways on a trailing 'model' mesh axis: the wide "
        "matmuls' weights (conv channels, Swin MLPs, projections) AND "
        "attention (whole heads per shard via the head-aligned qkv layout) "
        "are Megatron-sharded; GSPMD inserts the collectives (parallel/tp.py). "
        "Composes with multi-process; routes attention through the XLA path.",
    )
    parser.add_argument(
        "-grad_accum",
        type=positive_int,
        default=1,
        help="Accumulate gradients over N consecutive micro-batches before "
        "each optimizer update (optax.MultiSteps): effective batch = "
        "N x batch_size at one micro-batch's activation memory, plus one "
        "param-sized gradient accumulator in optimizer state (allocated "
        "for frozen leaves too). Exact for LayerNorm models; BatchNorm "
        "batch statistics stay per-micro-batch. FOCAL pretrain gathers "
        "projector features across the accumulation window so contrastive "
        "negatives span the full effective batch (see -no_accum_gather).",
    )
    parser.add_argument(
        "-no_accum_gather",
        action="store_true",
        help="With -grad_accum N in FOCAL pretrain, fall back to plain "
        "optax.MultiSteps averaging of per-micro-batch losses (contrastive "
        "negatives then stay per-micro-batch) instead of the default "
        "GradCache-style feature gather that makes accumulated pretraining "
        "equivalent to the large contrastive batch.",
    )
    parser.add_argument(
        "-ref_lr_timing",
        action="store_true",
        help="Reproduce the reference loop's epoch-END scheduler stepping "
        "(timm scheduler.step(e) after epoch e: epoch e trains at lr(e-1), "
        "epoch 0 at lr(0); reference: src/train_utils/supervised_train.py:104). "
        "Default: epoch e trains at lr(e).",
    )
    parser.add_argument(
        "-init_weight",
        type=str,
        default=None,
        help="Initialise model params (+ BatchNorm stats) from this "
        "params-only checkpoint before training starts (any stage). Used "
        "for warm starts and for init-ablation experiments (e.g. a "
        "torch-init state imported via utils/torch_import).",
    )
    parser.add_argument("-seed", type=int, default=0, help="PRNG seed.")
    parser.add_argument(
        "-input",
        type=str,
        default=None,
        help="predict.py: index file (.txt of sample paths) or directory of "
        ".npz/.pt sample files to run inference on (labels optional).",
    )
    parser.add_argument(
        "-predictions_out",
        type=str,
        default=None,
        help="predict.py: write per-sample predictions + latency JSON here.",
    )
    parser.add_argument(
        "-torch_out",
        type=str,
        default=None,
        help="tools/export_torch.py: output .pt path for the reference-"
        "compatible torch state_dict export of -model_weight.",
    )
    parser.add_argument(
        "-clip_grad",
        action="store_true",
        help="Apply the recipe's clip_grad value. Off by default: the reference "
        "declares clip_grad in yaml but never applies it (reference: "
        "src/train_utils/supervised_train.py:65-79 has no clipping).",
    )
    parser.add_argument(
        "-mixup_labels",
        action="store_true",
        help="Propagate mixup's soft labels to the loss. Off by default: the "
        "reference discards them (reference: src/data_augmenter/Augmenter.py:68).",
    )
    parser.add_argument(
        "-val_epochs", type=int, default=None, help="Validate every N epochs (default: stage-specific)."
    )
    parser.add_argument("-output_dir", type=str, default=None, help="Root for weights/ and result/ trees.")
    parser.add_argument(
        "-resume",
        action="store_true",
        help="Resume from this stage's newest full-state checkpoint (params, "
        "optimizer state, step, epoch). Requires -model_weight or a prior "
        "matching experiment folder.",
    )
    parser.add_argument(
        "-epochs_per_call",
        type=int,
        default=0,
        help="Epochs executed per device call (0 = auto: one val block for long runs).",
    )
    parser.add_argument(
        "-no_fused_views",
        action="store_true",
        help="Run the two pretrain views as separate forwards (strict reference "
        "BatchNorm statistics) instead of one fused [2B] batch.",
    )
    parser.add_argument(
        "-py_aug_draws",
        action="store_true",
        help="Attribution arm: draw each pretrain batch's random-augmenter "
        "selection on the host with Python random (the stream shape of the "
        "reference's np.random.randint at Augmenter.py:83) instead of the "
        "on-device keyed PRNG. Pretrain only; augmenter-internal draws stay "
        "keyed (identical distributions).",
    )
    parser.add_argument(
        "-ragged_tail",
        action="store_true",
        help="Attribution arm: run the final PARTIAL batch of each pretrain "
        "epoch like the reference sampler (BatchSeqSampler yields the ragged "
        "tail as a small extra contrastive step, "
        "multi_modal_dataloader.py:66-77) instead of dropping it.",
    )
    parser.add_argument(
        "-knn_backend",
        type=str,
        default="sklearn",
        choices=["sklearn", "jnp"],
        help="KNN probe backend for pretrain validation (jnp = on-device top-k).",
    )
    parser.add_argument(
        "-profile_dir",
        type=str,
        default=None,
        help="Capture a jax.profiler trace of a few training steps into this directory.",
    )
    parser.add_argument(
        "-no_pallas_block",
        action="store_true",
        help="Disable the whole-block attention kernel (qkv+attention+proj "
        "fused per window tile) and use the attention-only kernel.",
    )
    parser.add_argument(
        "-pallas_conv",
        action="store_true",
        help="Opt into the fused DeepSense conv-tower kernels (train-mode "
        "conv+BN+GELU+Dropout2d chains). Off by default: measured slower "
        "than the XLA lowering at reference channel dims (BASELINE.md).",
    )
    parser.add_argument(
        "-pallas_mlp",
        action="store_true",
        help="Opt into the fused Swin MLP kernel (fc1+GELU+dropout+fc2, the "
        "4C hidden never reaches HBM). Off by default: slower at reference "
        "dims, intended for wide configs like MOD_WIDE (BASELINE.md).",
    )
    parser.add_argument(
        "-hbm_budget_gb",
        type=float,
        default=0,
        help="Per-device HBM budget for the train split (GiB). Splits over "
        "budget stream host->device in double-buffered blocks. 0 = auto "
        "(60%% of reported device memory, else 8 GB).",
    )
    parser.add_argument(
        "-stream_block_steps",
        type=int,
        default=0,
        help="Steps per streamed block (0 = default 64). One device dispatch "
        "and one async H2D transfer per block.",
    )
    parser.add_argument(
        "-data_layout",
        type=str,
        default="auto",
        choices=["auto", "replicated", "sharded"],
        help="Train-split placement: replicated on every device, or row-sharded "
        "over the data mesh axis with shard-local shuffling (auto: sharded "
        "when multi-process, replicated otherwise).",
    )
    parser.add_argument(
        "-dist_coordinator",
        type=str,
        default=None,
        help="host:port of the jax.distributed coordinator (process 0). "
        "Enables multi-process execution; also via FOCAL_DIST_COORDINATOR.",
    )
    parser.add_argument(
        "-dist_num_processes",
        type=int,
        default=0,
        help="Total process count for multi-process execution (0 = autodetect "
        "on TPU pods); also via FOCAL_DIST_NUM_PROCESSES.",
    )
    parser.add_argument(
        "-dist_process_id",
        type=int,
        default=None,
        help="This process's id in [0, dist_num_processes); also via "
        "FOCAL_DIST_PROCESS_ID.",
    )
    return parser


def _parse(argv, option):
    args = build_parser().parse_args(argv)
    args.option = option
    # multi-process init must precede the first device query inside
    # set_auto_params (jax.distributed cannot initialize after backends do)
    from focal_tpu.parallel.distributed import maybe_initialize

    maybe_initialize(args)
    return set_auto_params(args)


def parse_train_params(argv=None):
    return _parse(argv, "train")


def parse_test_params(argv=None):
    return _parse(argv, "test")
