"""Label-ratio sweep: finetune (or supervised-train) across label ratios and
tasks, collating accuracy/F1 into one table (BASELINE config #5; the
reference runs these as individual -label_ratio launches,
reference: src/params/base_params.py:59-64).

Examples:
  # FOCAL finetune sweep from the newest pretrain checkpoint
  python sweep.py -model=DeepSense -dataset=MOD -learn_framework=FOCAL \
      -stage=finetune -ratios 0.01,0.1,0.5,1.0 -synthetic

  # supervised baseline sweep
  python sweep.py -model=DeepSense -dataset=MOD -learn_framework=no \
      -ratios 0.1,1.0 -synthetic
"""

import argparse
import json
import logging
import os
import warnings

warnings.simplefilter("ignore", UserWarning)
logging.getLogger("absl").setLevel(logging.WARNING)

if os.environ.get("FOCAL_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FOCAL_PLATFORM"])

from focal_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from focal_tpu.params.auto import set_auto_params
from focal_tpu.params.cli import build_parser


def main():
    parser = build_parser()
    parser.add_argument("-ratios", type=str, default="0.1,0.5,1.0", help="Comma-separated label ratios.")
    parser.add_argument("-tasks", type=str, default=None, help="Comma-separated tasks (default: recipe default task).")
    parser.add_argument("-out", type=str, default="sweep_results.json")
    argv_args = parser.parse_args()

    ratios = [float(r) for r in argv_args.ratios.split(",")]
    tasks = argv_args.tasks.split(",") if argv_args.tasks else [None]

    from focal_tpu.train.loops import finetune, supervised_train

    results = []
    for task in tasks:
        for ratio in ratios:
            args = argparse.Namespace(**vars(argv_args))
            args.label_ratio = ratio
            args.task = task
            args.option = "train"
            args = set_auto_params(args)
            logging.info(f"=== sweep: task={args.task} label_ratio={ratio} ===")
            if args.train_mode == "supervised":
                _, best_acc = supervised_train(args)
            else:
                args.stage = "finetune"
                _, best_acc = finetune(args)
            results.append({"task": args.task, "label_ratio": ratio, "best_val_acc": best_acc})

    with open(argv_args.out, "w") as f:
        json.dump(results, f, indent=2)

    print(f"\n{'task':<28}{'ratio':>8}{'best val acc':>14}")
    for r in results:
        print(f"{r['task']:<28}{r['label_ratio']:>8}{r['best_val_acc']:>14.4f}")
    print(f"\nwritten to {argv_args.out}")


if __name__ == "__main__":
    main()
