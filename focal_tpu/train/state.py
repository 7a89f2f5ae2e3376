"""Train state: params + BatchNorm stats + optimizer state + step counter."""

from typing import Any

import jax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def init_state(args, model, sample_freq_x, tx, rng):
    """Initialise model variables (running every head so all params exist)
    and wrap them in a TrainState.

    init is wrapped in jit: an eager init dispatches hundreds of one-op
    programs, each separately compiled — pathological on remote-compile
    backends."""
    params_rng, dropout_rng = jax.random.split(rng)

    @jax.jit
    def _init(rngs, x):
        return model.init(rngs, x, train=False, head="both")

    variables = _init({"params": params_rng, "dropout": dropout_rng}, sample_freq_x)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def param_count(params):
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
