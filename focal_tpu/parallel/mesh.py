"""Device mesh & sharding plans.

The reference is strictly single-device (reference: src/params/params_util.py:
20-55 — one CUDA GPU, no torch.distributed anywhere). Parallelism here is a
first-class TPU-native design instead: a 1-D ``data`` mesh over ICI with
batch-axis NamedShardings. Everything flows through jit/pjit; XLA inserts the
gradient all-reduces. The mesh is built so a ``model`` axis can be added later
(FOCAL-scale models don't need TP/PP).

On a single device ``make_mesh_plan`` returns None and the step functions jit
without shardings.
"""

from dataclasses import dataclass
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshPlan:
    mesh: Mesh
    replicated: NamedSharding
    batch_sharded: NamedSharding

    @property
    def num_devices(self) -> int:
        return self.mesh.size


def make_mesh_plan(data_parallel: int = 0, devices=None) -> Optional[MeshPlan]:
    """Build a 1-D data mesh. data_parallel=0 -> all local devices.
    Returns None when only one device participates (plain jit path)."""
    devices = list(devices if devices is not None else jax.devices())
    n = data_parallel if data_parallel > 0 else len(devices)
    if n <= 1:
        return None
    if n > len(devices):
        raise ValueError(f"Requested {n} devices on the data axis, have {len(devices)}")
    mesh = Mesh(devices[:n], ("data",))
    return MeshPlan(
        mesh=mesh,
        replicated=NamedSharding(mesh, P()),
        batch_sharded=NamedSharding(mesh, P("data")),
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
