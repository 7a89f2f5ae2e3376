"""Batch-inference CLI (serving surface; no reference equivalent — the
reference stops at the labeled-split evaluation CLI, src/test.py:16-58).

Loads a trained classifier checkpoint, AOT-compiles a fixed-batch forward,
and predicts over an index file / directory of sample files (labels
optional) or a synthetic demo batch:

    python predict.py -dataset MOD -model DeepSense -learn_framework no \
        -input data/new_samples/ -predictions_out preds.json

Prints a latency summary (compile excluded, H2D/D2H included) and — when
the inputs carry labels — accuracy for a sanity check.
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

import numpy as np

from focal_tpu.params import parse_test_params
from focal_tpu.serve import Predictor, load_input, write_predictions


def predict(args):
    if getattr(args, "input", None):
        data, labels, names = load_input(args.input, args.task)
    elif getattr(args, "synthetic", False):
        from focal_tpu.data.synthetic import synthetic_arrays

        data, labels, names = synthetic_arrays(
            args.dataset_config, args.task, getattr(args, "synthetic_samples", 512), seed=args.seed + 3
        )
    else:
        raise ValueError("predict.py needs -input <index.txt | sample dir> (or -synthetic)")

    predictor = Predictor(args)
    n = len(names)
    print(f"Predicting {n} samples (batch {predictor.batch_size}, "
          f"checkpoint {predictor.checkpoint_path})")
    result = predictor.predict(data)

    lat = result["latency"]
    print(
        f"Latency: compile {lat['compile_s']:.1f}s once; per batch "
        f"mean {lat['mean_s'] * 1e3:.2f} ms, p50 {lat['p50_s'] * 1e3:.2f} ms, "
        f"p99 {lat['p99_s'] * 1e3:.2f} ms -> {lat['windows_per_s']:.0f} windows/s"
    )
    labeled = labels >= 0
    if labeled.any():
        acc = float((result["preds"][labeled] == labels[labeled]).mean())
        print(f"Accuracy on the {int(labeled.sum())} labeled inputs: {acc:.5f}")

    out_path = getattr(args, "predictions_out", None)
    if out_path:
        write_predictions(out_path, names, result, labels)
        print(f"Wrote {out_path}")
    else:
        for i in range(min(5, n)):
            print(f"  {names[i]}: pred={int(result['preds'][i])} "
                  f"p={result['probs'][i].max():.3f}")
    return result


def main_predict():
    args = parse_test_params()
    predict(args)


if __name__ == "__main__":
    main_predict()
