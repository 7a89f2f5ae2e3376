"""Evaluation CLI (reference surface: src/test.py:16-58): reload a trained
checkpoint and report loss / accuracy / macro-F1 / confusion on the test split."""

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

import optax

from focal_tpu.data.loader import create_dataloader
from focal_tpu.models import build_backbone
from focal_tpu.ops import build_augmenter
from focal_tpu.params import parse_test_params
from focal_tpu.parallel.mesh import make_mesh_plan, put_replicated
from focal_tpu.train import checkpoint as ckpt
from focal_tpu.train import evaluate as ev
from focal_tpu.train.state import init_state

import jax
import jax.numpy as jnp


def test(args):
    mesh_plan = make_mesh_plan(getattr(args, "data_parallel", 0))
    test_loader = create_dataloader("test", args)
    augmenter = build_augmenter(args)
    model = build_backbone(args)

    ds = test_loader.dataset
    data = put_replicated(
        {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in ds.data.items()},
        mesh_plan,
    )

    sample = augmenter.no(
        {loc: {m: jnp.asarray(a[:2]) for m, a in mods.items()} for loc, mods in ds.data.items()}
    )
    state = init_state(args, model, sample, optax.identity(), jax.random.key(args.seed))
    logging.info(f"= Loading classifier weight: {args.classifier_weight}")
    state = ckpt.load_params_into(state, args.classifier_weight, load_class_layer=True)
    state = put_replicated(state, mesh_plan)

    fwd_class = ev.make_batched_forward(model, augmenter, "class", mesh_plan)
    plan = ev.EvalPlan(test_loader, mesh_plan)
    test_loss, metrics = ev.eval_supervised(args, state, fwd_class, plan, data)

    if "regression" in args.task:
        # regression branch (reference: test.py:39-41)
        print(f"Test classifier loss: {test_loss: .5f}, test mse: {metrics[0]: .5f}")
        return test_loss, metrics[0]
    print(f"Test classifier loss: {test_loss: .5f}")
    print(f"Test acc: {metrics[0]: .5f}, test f1: {metrics[1]: .5f}")
    print(f"Test confusion matrix:\n {metrics[2]}")
    return test_loss, metrics[0], metrics[1]


def main_test():
    args = parse_test_params()
    test(args)


if __name__ == "__main__":
    main_test()
