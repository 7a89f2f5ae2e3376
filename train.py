"""Training CLI (reference surface: src/train.py:25-94).

Examples:
  python train.py -model=DeepSense -dataset=MOD -learn_framework=no -synthetic
  python train.py -model=DeepSense -dataset=MOD -learn_framework=FOCAL -stage=pretrain
  python train.py -model=DeepSense -dataset=MOD -learn_framework=FOCAL -stage=finetune
"""

import logging
import os
import warnings

warnings.simplefilter("ignore", UserWarning)
logging.getLogger("absl").setLevel(logging.WARNING)

if os.environ.get("FOCAL_PLATFORM"):
    # explicit platform override (site config may force JAX_PLATFORMS)
    import jax

    jax.config.update("jax_platforms", os.environ["FOCAL_PLATFORM"])

from focal_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from focal_tpu.params import parse_train_params
from focal_tpu.train.loops import finetune, pretrain, supervised_train


def train(args):
    if args.train_mode == "supervised":
        return supervised_train(args)
    if args.stage == "pretrain":
        return pretrain(args)
    if args.stage == "finetune":
        return finetune(args)
    raise ValueError(f"Invalid stage ({args.stage}) provided.")


def main_train():
    args = parse_train_params()
    import jax

    logging.info(
        f"= Run: dataset={args.dataset} model={args.model} framework={args.learn_framework} "
        f"stage={args.stage} mode={args.train_mode} task={args.task} batch={args.batch_size}"
    )
    # recorded so experiment harnesses can verify which backend actually ran
    # (a '-platform tpu' request silently falling back to CPU would otherwise
    # be invisible in the logs)
    logging.info(
        f"= Backend: {jax.default_backend()} ({len(jax.devices())} device(s), "
        f"{jax.devices()[0].device_kind})"
    )
    train(args)


if __name__ == "__main__":
    main_train()
