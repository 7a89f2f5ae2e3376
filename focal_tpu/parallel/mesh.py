"""Device mesh & sharding plans.

The reference is strictly single-device (reference: src/params/params_util.py:
20-55 — one CUDA GPU, no torch.distributed anywhere). Parallelism here is a
first-class TPU-native design instead:

- a ``data`` mesh axis over ICI with batch-axis NamedShardings (DP); XLA
  inserts the gradient psums,
- an optional ``model`` mesh axis (``-model_parallel``) carrying
  Megatron-style weight shardings for the wide matmuls (parallel/tp.py);
  GSPMD propagates the activation shardings and inserts the collectives.

Everything flows through jit/pjit. On a single device ``make_mesh_plan``
returns None and the step functions jit without shardings.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshPlan:
    mesh: Mesh
    replicated: NamedSharding
    batch_sharded: NamedSharding
    dp: int  # ways on the "data" axis
    mp: int = 1  # ways on the "model" axis (1 = no tensor parallelism)

    @property
    def num_devices(self) -> int:
        return self.mesh.size


def make_mesh_plan(
    data_parallel: int = 0, model_parallel: int = 1, devices=None
) -> Optional[MeshPlan]:
    """Build the device mesh. data_parallel=0 -> fill the data axis with all
    remaining local devices; model_parallel>1 adds a trailing ``model`` axis
    (adjacent devices, so TP collectives ride the fastest ICI links).
    Returns None when only one device participates (plain jit path)."""
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, model_parallel)
    if len(devices) % mp:
        raise ValueError(f"model_parallel={mp} does not divide {len(devices)} devices")
    dp = data_parallel if data_parallel > 0 else len(devices) // mp
    n = dp * mp
    if n <= 1:
        return None
    if n > len(devices):
        raise ValueError(
            f"Requested {dp} (data) x {mp} (model) devices, have {len(devices)}"
        )
    if mp > 1:
        mesh = Mesh(np.asarray(devices[:n]).reshape(dp, mp), ("data", "model"))
    else:
        mesh = Mesh(devices[:n], ("data",))
    return MeshPlan(
        mesh=mesh,
        replicated=NamedSharding(mesh, P()),
        batch_sharded=NamedSharding(mesh, P("data")),
        dp=dp,
        mp=mp,
    )


def put_replicated(tree, mesh_plan: Optional[MeshPlan]):
    """Place a pytree on device(s), replicated over the mesh."""
    if mesh_plan is None:
        return jax.device_put(tree)
    return jax.device_put(tree, mesh_plan.replicated)


def put_batch_sharded(tree, mesh_plan: Optional[MeshPlan]):
    """Shard a pytree's leading axis over the data mesh axis."""
    if mesh_plan is None:
        return jax.device_put(tree)
    return jax.device_put(tree, mesh_plan.batch_sharded)
