"""Multi-process (multi-host) execution.

The reference is strictly single-process/single-device (its device selection
is one CUDA GPU at src/params/params_util.py:20-55; no torch.distributed
anywhere). This module is the TPU-native replacement: JAX's multi-controller
SPMD model, where N identical processes each drive their local chips and
jit/pjit programs span the global device mesh over ICI/DCN.

Topology comes from flags or environment (one process per TPU host):

    -dist_coordinator 10.0.0.1:8476 -dist_num_processes 4 -dist_process_id 0
    FOCAL_DIST_COORDINATOR / FOCAL_DIST_NUM_PROCESSES / FOCAL_DIST_PROCESS_ID

On real TPU pods `jax.distributed.initialize()` can also infer everything
from the TPU metadata; passing `-dist_num_processes 0` with a coordinator
requests that auto-detection. Initialization MUST happen before the first
device query, so `parse_train_params`/`parse_test_params` call
``maybe_initialize`` between argparse and auto-param derivation.

Data feeding follows the per-host pattern from SURVEY §2.6: every process
materialises only its shard of the training split and the global array is
assembled with ``jax.make_array_from_process_local_data`` (see
``put_row_sharded``). Small eval splits are replicated on every process.
"""

import logging
import os

import jax
import numpy as np


def _env_int(name, default=None):
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else default


def maybe_initialize(args=None):
    """Initialize jax.distributed when a multi-process topology is configured.

    Returns True when running multi-process. Safe to call repeatedly (the
    second call is a no-op). Flag values win over FOCAL_DIST_* env vars.
    """
    coord = getattr(args, "dist_coordinator", None) or os.environ.get("FOCAL_DIST_COORDINATOR")
    nproc = getattr(args, "dist_num_processes", None)
    if nproc in (None, 0):
        nproc = _env_int("FOCAL_DIST_NUM_PROCESSES", 0)
    pid = getattr(args, "dist_process_id", None)
    if pid is None:
        pid = _env_int("FOCAL_DIST_PROCESS_ID")

    if not coord:
        return jax.process_count() > 1
    if jax._src.distributed.global_state.client is not None:  # already initialized
        return jax.process_count() > 1

    kwargs = {"coordinator_address": coord}
    if nproc and nproc > 0:
        if pid is None:
            if nproc > 1:
                # defaulting to 0 would make every worker claim process 0 and
                # hang the coordinator rendezvous — fail fast instead
                raise ValueError(
                    "dist_num_processes > 1 requires -dist_process_id (or "
                    "FOCAL_DIST_PROCESS_ID) — it cannot be defaulted: every "
                    "process would claim id 0 and the rendezvous would hang"
                )
            pid = 0
        kwargs["num_processes"] = nproc
        kwargs["process_id"] = pid
    jax.distributed.initialize(**kwargs)
    logging.info(
        f"= jax.distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global devices"
    )
    from focal_tpu.utils.cache import disable_for_multiprocess_cpu

    disable_for_multiprocess_cpu()
    return jax.process_count() > 1


def process_index():
    return jax.process_index()


def process_count():
    return jax.process_count()


def is_main():
    """True on the process that owns checkpoints and result logs."""
    return jax.process_index() == 0


_barrier_counter = [0]


def barrier(name, timeout_ms=900_000):
    """Cross-process sync through the coordination service (gRPC — no
    device collectives, long timeout). No-op single-process."""
    if jax.process_count() <= 1:
        return
    client = jax._src.distributed.global_state.client
    if client is None:
        return
    _barrier_counter[0] += 1
    client.wait_at_barrier(f"focal/{name}/{_barrier_counter[0]}", timeout_ms)


def sync_first_call(fn, name):
    """Align all processes immediately before a jitted program's FIRST
    invocation. Rationale: a new multi-device executable creates its gloo
    communicator contexts lazily at first execution, and the rendezvous
    KV-get times out after a hardcoded ~30s — less than the compile-time
    skew two processes can accumulate. Barriering first aligns the compile
    start, so both sides reach the rendezvous within moments of each other.
    Single-process: returns fn unchanged."""
    if jax.process_count() <= 1:
        return fn
    state = {"done": False}

    def wrapped(*a, **k):
        if not state["done"]:
            barrier(f"first_call/{name}")
            state["done"] = True
        return fn(*a, **k)

    for attr in ("steps_per_epoch", "epochs_per_call", "windows_per_epoch"):
        if hasattr(fn, attr):
            setattr(wrapped, attr, getattr(fn, attr))
    return wrapped


def local_axis_slice(sharding, shape, axis=0):
    """The contiguous global index range this process feeds along `axis` of a
    sharded array with global `shape`. Meshes built from jax.devices() order
    devices process-major, so every process's shards form one contiguous
    slice; asserted here rather than assumed."""
    n = shape[axis]
    index_map = sharding.addressable_devices_indices_map(tuple(shape))
    starts = sorted(
        (0 if sl[axis].start is None else sl[axis].start,
         n if sl[axis].stop is None else sl[axis].stop)
        for sl in index_map.values()
    )
    lo, hi = starts[0][0], starts[-1][1]
    covered = sum(b - a for a, b in set(starts))
    if covered != hi - lo:
        raise ValueError(
            f"process-local shards are not contiguous ({starts}); "
            "build the mesh from jax.devices() in default order"
        )
    return lo, hi


def _local_row_slice(sharding, n_rows):
    """The contiguous global row range this process feeds for a P('data')
    row-sharded array. Meshes built from jax.devices() order devices
    process-major, so every process's shards form one contiguous slice;
    asserted here rather than assumed."""
    index_map = sharding.addressable_devices_indices_map((n_rows,))
    starts = sorted(
        (0 if sl[0].start is None else sl[0].start, n_rows if sl[0].stop is None else sl[0].stop)
        for sl in index_map.values()
    )
    lo, hi = starts[0][0], starts[-1][1]
    covered = sum(b - a for a, b in starts)
    if covered != hi - lo:
        raise ValueError(
            f"process-local shards are not contiguous ({starts}); "
            "build the mesh from jax.devices() in default order"
        )
    return lo, hi


def put_row_sharded(tree, mesh_plan):
    """Build global arrays sharded on the leading (row) axis over the data
    mesh axis, feeding each device from this process's host memory only.

    `tree` holds FULL global host arrays (every process can cheaply
    materialise the whole split index; only the rows for local devices are
    transferred/retained on this host's devices). Single-process this is a
    plain sharded device_put.
    """
    if mesh_plan is None:
        return jax.device_put(tree)
    sharding = mesh_plan.batch_sharded
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def place(a):
        a = np.asarray(a)
        lo, hi = _local_row_slice(sharding, a.shape[0])
        return jax.make_array_from_process_local_data(sharding, a[lo:hi])

    return jax.tree_util.tree_map(place, tree)


def put_replicated_global(tree, mesh_plan):
    """Replicate a host pytree over every device of a (possibly multi-process)
    mesh. Single-process falls back to device_put. Multi-process goes through
    a jitted identity: uncommitted inputs with the same value on every
    process are the documented way to form replicated global arrays, and it
    handles extended dtypes (PRNG keys) that make_array_from_process_local_data
    cannot."""
    if mesh_plan is None or jax.process_count() == 1:
        from focal_tpu.parallel.mesh import put_replicated

        return put_replicated(tree, mesh_plan)
    sharding = mesh_plan.replicated
    shardings = jax.tree_util.tree_map(lambda _: sharding, tree)
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)
