"""Host->device streaming for splits that exceed an HBM budget.

The device-resident path (train/loops.py) gathers batches directly in HBM —
fastest, but it caps the dataset at device memory (the reference streams
lazily from disk at src/input_utils/multi_modal_dataset.py:40 and has no
such ceiling). Above a configurable per-device budget this module takes
over: the split stays in host RAM and training runs in double-buffered
BLOCKS of K steps — one async H2D transfer and ONE device dispatch per
block, so per-step dispatch latency (the tunnel-dominant cost measured in
round 1: 637 windows/s with per-step calls) is amortized K-fold, and block
k+1 is assembled + transferred while block k computes.

HBM held at any moment: 2 blocks (current + prefetch) instead of the whole
split. Shuffling is a host-side permutation per epoch (deterministic from
the run seed), so coverage semantics match the device-resident path; the
permutation source differs (numpy instead of jax.random), which only
changes WHICH random order is used, not its distribution.

Budget resolution: `-hbm_budget_gb` flag; 0 = auto (60% of the device's
reported bytes_limit, or 8 GiB when the backend reports nothing).
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from focal_tpu.parallel.mesh import put_replicated


DEFAULT_BUDGET_BYTES = 8 << 30
BLOCK_STEPS = 64


def split_nbytes(data_tree):
    """Host bytes of one split (per device when replicated)."""
    return sum(np.asarray(a).nbytes for a in jax.tree_util.tree_leaves(data_tree))


def device_budget_bytes(args):
    gb = float(getattr(args, "hbm_budget_gb", 0) or 0)
    if gb > 0:
        return int(gb * (1 << 30))
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(0.6 * stats["bytes_limit"])
    except Exception:
        pass
    return DEFAULT_BUDGET_BYTES


def _batch_sharding(mesh_plan):
    """[K, B, ...] blocks: steps on axis 0, batch sharded on axis 1."""
    if mesh_plan is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh_plan.mesh, P(None, "data"))


class _BlockFeeder:
    """Assembles permuted [K, B, ...] blocks on host and device_puts them
    asynchronously (the transfer of block k+1 overlaps block k's compute).

    Multi-process: every process computes the SAME global permutation (seeded
    identically), assembles only the batch COLUMNS its local devices own for
    the P(None, 'data') block sharding, and forms the global array with
    jax.make_array_from_process_local_data — so each host streams exactly its
    shard's bytes (VERDICT round-3 item 6)."""

    def __init__(self, host_data, host_labels, sharding):
        self.data = host_data
        self.labels = host_labels
        self.sharding = sharding
        self.multiproc = jax.process_count() > 1 and sharding is not None

    def block(self, row_idx):
        """row_idx: [K, B] sample rows -> device {loc: {mod: [K, B, ...]}}."""
        if self.multiproc:
            from focal_tpu.parallel.distributed import local_axis_slice

            # gather ONLY this process's batch columns (the [K, B] index and
            # every [K, B, ...] leaf shard axis 1 identically under
            # P(None, 'data')); global arrays form from the local slabs
            lo, hi = local_axis_slice(self.sharding, row_idx.shape, axis=1)
            local_rows = row_idx[:, lo:hi]
            put = lambda a: jax.make_array_from_process_local_data(
                self.sharding, np.ascontiguousarray(a[local_rows])
            )
        elif self.sharding is not None:
            local_rows = row_idx
            put = lambda a: jax.device_put(a[local_rows], self.sharding)
        else:
            local_rows = row_idx
            put = lambda a: jax.device_put(a[local_rows])
        out = [jax.tree_util.tree_map(put, self.data)]
        if self.labels is not None:
            out.append(put(self.labels))
        return out


class StreamingEpochFn:
    """Signature-compatible replacement for the device-resident epoch fns:
    call(state, data_ignored, rng [, labels_ignored]) -> same outputs, one
    EPOCH per call (block dispatch already amortizes per-call latency, so
    multi-epoch blocks buy nothing here)."""

    def __init__(self, *, host_data, host_labels, n_units, per, unit_rows,
                 make_block_fn, seed, block_steps=BLOCK_STEPS, mesh_plan=None,
                 samples_per_unit=1, micro_per_update=1):
        # unit_rows: [n_units, samples_per_unit] sample rows per shuffle unit
        # (subsequences for FOCAL pretrain, single samples otherwise).
        # micro_per_update > 1 = gathered grad accumulation: block sizes and
        # steps_per_epoch count EFFECTIVE updates; each effective step
        # consumes micro_per_update batch rows of the streamed block (the
        # ragged micro tail of the epoch is dropped, like the device-resident
        # accum path).
        self.n_units = n_units
        self.per = per
        self.unit_rows = unit_rows
        self.seed = seed
        self.mpu = micro_per_update
        self.steps_per_epoch = max(1, (n_units // per) // micro_per_update)
        self.epochs_per_call = 1
        self.windows_per_epoch = (
            self.steps_per_epoch * micro_per_update * per * samples_per_unit
        )
        k = min(max(1, block_steps // micro_per_update), self.steps_per_epoch)
        self._k_main = k
        self._n_full = self.steps_per_epoch // k
        rem = self.steps_per_epoch - self._n_full * k
        self._k_rem = rem
        self._fns = {k: make_block_fn(k)}
        if rem:
            self._fns[rem] = make_block_fn(rem)
        self._feeder = _BlockFeeder(host_data, host_labels, _batch_sharding(mesh_plan))
        self._epoch = None  # derived from state.step on first call

    def _block_sizes(self):
        return [self._k_main] * self._n_full + ([self._k_rem] if self._k_rem else [])

    def _rows(self, perm, step0, k):
        m = self.per * self.mpu
        sel = perm[step0 * m : (step0 + k) * m]
        rows = self.unit_rows[sel].reshape(k * self.mpu, -1)  # [micro, per*spu]
        return rows

    def __call__(self, state, _data, *rest):
        # matches both loop call shapes: (state, data, rng) for pretrain and
        # (state, data, labels, rng) for the classifier loops — the split
        # data/labels arguments are ignored (this object owns the host copy)
        rng = rest[-1]
        if self._epoch is None:
            self._epoch = int(jax.device_get(state.step)) // self.steps_per_epoch
        perm = np.random.default_rng(self.seed + self._epoch).permutation(self.n_units)
        sizes = self._block_sizes()
        losses = []
        step0 = 0
        nxt = self._feeder.block(self._rows(perm, 0, sizes[0]))
        for i, k in enumerate(sizes):
            cur = nxt
            state, loss = self._fns[k](state, *cur, rng)  # async dispatch
            losses.append(loss)
            step0 += k
            if i + 1 < len(sizes):  # overlaps the running block's compute
                nxt = self._feeder.block(self._rows(perm, step0, sizes[i + 1]))
        self._epoch += 1
        # each block fn returns a mean over its k steps; weight block means by
        # k so the epoch value equals the uniform per-step mean the
        # device-resident epoch fn reports (the ragged tail block would
        # otherwise be overweighted ~block_steps/rem times)
        w = jnp.asarray(sizes, dtype=jnp.float32) / float(sum(sizes))
        if isinstance(losses[0], tuple):  # (loss, acc) classifier variant
            means = tuple(
                jnp.sum(w * jnp.stack([l[j] for l in losses]))
                for j in range(len(losses[0]))
            )
            return (state, *means)
        return state, jnp.sum(w * jnp.stack(losses))


def make_streaming_pretrain_fn(model, augmenter, focal_loss, *, host_data, n_units,
                               batch_size, subseq_idx, mesh_plan, fused_views,
                               seed, block_steps=BLOCK_STEPS, grad_accum=1,
                               accum_gather=True, state_shardings=None):
    """Streaming variant of make_pretrain_epoch_fn. host_data holds numpy
    arrays; blocks of K steps are shipped as [K, B, ...].

    grad_accum > 1 with accum_gather (the default) runs the same exact
    GradCache two-pass as the device-resident path (steps.
    gathered_accum_update): the streamed block holds every micro-batch an
    effective step needs, so pass 2's recompute indexes the block again —
    contrastive negatives span the effective batch. Block sizes are counted
    in effective steps; the epoch's ragged micro tail is dropped (same rule
    as the device-resident accum path). accum_gather=False leaves per-micro
    MultiSteps to the optimizer.

    state_shardings: TP layout tree (parallel/tp.py) — streaming is
    batch-axis work, orthogonal to model-sharded weights; blocks shard
    P(None, 'data') over the 2-D mesh and replicate over ``model``."""
    from focal_tpu.train.steps import (
        _apply_train,
        _shard_batch,
        gathered_accum_update,
        make_micro_features,
        make_view_fuser,
    )

    if subseq_idx is not None:
        seq_len = subseq_idx.shape[1]
        per = max(1, batch_size // seq_len)
        unit_rows = np.asarray(subseq_idx)
    else:
        seq_len = 1
        per = batch_size
        unit_rows = np.arange(n_units)[:, None]
    b = per * seq_len
    fuse_views, split_views = make_view_fuser(mesh_plan, b, seq_len)
    ga = grad_accum if (grad_accum > 1 and accum_gather) else 1
    if ga > 1 and max(1, n_units // per) < ga:
        raise ValueError(
            f"-grad_accum {grad_accum} exceeds the {max(1, n_units // per)} "
            "streamed steps per epoch; lower -grad_accum or -batch_size"
        )
    micro_features = make_micro_features(model, fuse_views, split_views, fused_views)

    def make_block_fn(k):
        def block(state, block_data, rng):
            base = jax.random.fold_in(rng, state.step)

            def views_of(i):
                batch = jax.tree_util.tree_map(lambda a: jnp.take(a, i, axis=0), block_data)
                batch = _shard_batch(batch, mesh_plan)
                rng_v1, rng_v2, rng_drop = jax.random.split(
                    jax.random.fold_in(base, i), 3
                )
                return augmenter.random(rng_v1, batch), augmenter.random(rng_v2, batch), rng_drop

            if ga > 1:
                def eff_body(state, e):
                    micro_ids = e * ga + jnp.arange(ga)
                    return gathered_accum_update(
                        focal_loss, micro_features, views_of, state, micro_ids
                    )

                state, losses = jax.lax.scan(eff_body, state, jnp.arange(k))
                return state, jnp.mean(losses)

            def body(state, i):
                view1, view2, rng_drop = views_of(i)

                def loss_fn(params):
                    f1, f2, new_stats = micro_features(
                        params, state.batch_stats, view1, view2, rng_drop
                    )
                    loss, _ = focal_loss(f1, f2)
                    return loss, new_stats

                (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
                return state, loss

            state, losses = jax.lax.scan(body, state, jnp.arange(k))
            return state, jnp.mean(losses)

        if mesh_plan is None:
            return jax.jit(block, donate_argnums=(0,))
        r = mesh_plan.replicated
        d = _batch_sharding(mesh_plan)
        s = state_shardings if state_shardings is not None else r
        return jax.jit(block, in_shardings=(s, d, r), out_shardings=(s, r),
                       donate_argnums=(0,))

    return StreamingEpochFn(
        host_data=host_data, host_labels=None, n_units=n_units, per=per,
        unit_rows=unit_rows, make_block_fn=make_block_fn, seed=seed,
        block_steps=block_steps, mesh_plan=mesh_plan, samples_per_unit=seq_len,
        micro_per_update=ga,
    )


def make_streaming_classifier_fn(model, augmenter, *, host_data, host_labels,
                                 n_items, batch_size, fixed_aug, mesh_plan,
                                 seed, block_steps=BLOCK_STEPS,
                                 state_shardings=None):
    """Streaming variant of make_classifier_epoch_fn (supervised/finetune)."""
    from focal_tpu.train.losses import cross_entropy
    from focal_tpu.train.steps import _apply_train, _shard_batch

    per = min(batch_size, n_items)

    def make_block_fn(k):
        def block(state, block_data, block_labels, rng):
            base = jax.random.fold_in(rng, state.step)

            def body(state, inp):
                i, batch, batch_labels = inp
                batch = _shard_batch(batch, mesh_plan)
                rng_aug, rng_drop = jax.random.split(jax.random.fold_in(base, i))
                if fixed_aug:
                    freq_x, targets = augmenter.fixed(rng_aug, batch, batch_labels)
                else:
                    freq_x, targets = augmenter.no(batch), batch_labels

                def loss_fn(params):
                    out, new_stats = _apply_train(
                        model, state.replace(params=params), freq_x, rng_drop, "class"
                    )
                    return cross_entropy(out, targets), (out, new_stats)

                (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
                hard = targets.argmax(-1) if targets.ndim > 1 else targets
                acc = jnp.mean((logits.argmax(-1) == hard).astype(jnp.float32))
                return state, (loss, acc)

            state, (losses, accs) = jax.lax.scan(
                body, state, (jnp.arange(k), block_data, block_labels)
            )
            return state, (jnp.mean(losses), jnp.mean(accs))

        if mesh_plan is None:
            return jax.jit(block, donate_argnums=(0,))
        r = mesh_plan.replicated
        d = _batch_sharding(mesh_plan)
        s = state_shardings if state_shardings is not None else r
        return jax.jit(block, in_shardings=(s, d, d, r), out_shardings=(s, (r, r)),
                       donate_argnums=(0,))

    return StreamingEpochFn(
        host_data=host_data, host_labels=np.asarray(host_labels), n_units=n_items,
        per=per, unit_rows=np.arange(n_items)[:, None], make_block_fn=make_block_fn,
        seed=seed, block_steps=block_steps, mesh_plan=mesh_plan,
    )


def make_streaming_forward(model, augmenter, head, *, host_data, mesh_plan,
                           batch_size, n_rows, block_steps=BLOCK_STEPS,
                           state_shardings=None):
    """Streaming no-aug forward over a split for eval/KNN: returns
    fn(state) -> host outputs [n_batches, B, ...] covering rows 0..n_rows
    (tail padded by wrapping; callers mask with their weights)."""

    nb = int(np.ceil(n_rows / batch_size))
    idx = (np.arange(nb * batch_size) % n_rows).reshape(nb, batch_size)
    feeder = _BlockFeeder(host_data, None, _batch_sharding(mesh_plan))

    def make_block_fn(k):
        def block(state, block_data):
            variables = {"params": state.params, "batch_stats": state.batch_stats}

            def body(_, batch):
                from focal_tpu.train.steps import _shard_batch

                freq_x = augmenter.no(_shard_batch(batch, mesh_plan))
                return None, model.apply(variables, freq_x, train=False, head=head)

            _, outs = jax.lax.scan(body, None, block_data)
            return outs

        if mesh_plan is None:
            return jax.jit(block)
        r = mesh_plan.replicated
        s = state_shardings if state_shardings is not None else r
        return jax.jit(block, in_shardings=(s, _batch_sharding(mesh_plan)),
                       out_shardings=r)

    sizes = []
    k = min(block_steps, nb)
    sizes = [k] * (nb // k) + ([nb % k] if nb % k else [])
    fns = {s: make_block_fn(s) for s in set(sizes)}

    def run(state):
        outs = []
        b0 = 0
        nxt = feeder.block(idx[b0 : b0 + sizes[0]])
        for i, k in enumerate(sizes):
            cur = nxt
            out = fns[k](state, *cur)
            outs.append(out)
            b0 += k
            if i + 1 < len(sizes):
                nxt = feeder.block(idx[b0 : b0 + sizes[i + 1]])
        return jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(jax.device_get(x)) for x in xs]), *outs
        )

    run.idx = idx
    run.nb = nb
    return run


class StreamingEvalPlan:
    """EvalPlan-compatible schedule for a streaming split: row order comes
    from the paired make_streaming_forward (sequential, tail wrapped with
    weight 0)."""

    def __init__(self, labels, fwd):
        idx = fwd.idx
        n_rows = int(labels.shape[0])
        self.idx = idx
        self.weight = (np.arange(idx.size) < n_rows).reshape(idx.shape).astype(np.float32)
        self.labels = np.asarray(labels)[idx]
        self.device_idx = None  # the streaming forward owns its schedule
