"""Jitted training/eval steps.

Each step is one XLA program: gather the batch from the device-resident data
arrays, augment (+FFT), run the model, compute the loss, update. The
``data``/``labels`` arguments are the whole split already living in HBM; the
``idx`` array selects the batch, so steady-state steps move no bytes over
PCIe/DCN (contrast: reference copies every batch host->device at
src/data_augmenter/Augmenter.py:128-138).

Sharding: ``make_*_step`` functions accept an optional
``focal_tpu.parallel.MeshPlan``; batches are sharded on the leading axis over
the data mesh axis, parameters replicated. XLA inserts the gradient psums.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from focal_tpu.train.losses import cross_entropy


def gather_batch(data, idx):
    return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), data)


# ---------------------------------------------------------------------------
# sharded data layout (multi-host): the split lives row-sharded over the data
# mesh axis (each device holds only its own rows, grouped per device at
# placement time by parallel.distributed.put_row_sharded). Shuffling is
# shard-local — each device permutes its own rows — so the batch gather never
# crosses devices: zero ICI/DCN traffic on the data path. Every global batch
# still mixes all shards (it takes per_local rows from EVERY device).
# ---------------------------------------------------------------------------


def make_view_fuser(mesh_plan, batch_samples, seq_len=1):
    """(fuse, split) for the fused-views [2B] pretrain batch.

    A plain jnp.concatenate of two batch-sharded views interleaves shards:
    XLA lowers it (and its gradient) as all-to-alls — measured 945 of them
    in the 8-device DP epoch program, dominating its collective traffic.
    Under shard_map each device concatenates its own rows locally instead;
    the fused batch's global row order becomes device-major, which is a
    PERMUTATION applied identically to both views — and every FOCAL loss
    term is invariant to a shared whole-subsequence row permutation (the
    similarity diagonals still pair view1[i] with view2[i]; subsequences
    stay contiguous because shard boundaries fall on subsequence boundaries
    when batch/n_devices is a multiple of seq_len, which is gated here).

    Falls back to plain concatenate off-mesh or when the gate fails.
    """
    n = mesh_plan.dp if mesh_plan is not None else 1
    # TP meshes use the plain concatenate: GSPMD places it, and the
    # shard-local fuser's out_specs would have to prove model-axis
    # replication through the pallas-free path anyway
    if mesh_plan is None or mesh_plan.mp > 1 or n <= 1 or batch_samples % (n * seq_len) != 0:
        def fuse(v1, v2):
            return jax.tree_util.tree_map(
                lambda a, c: jnp.concatenate([a, c], axis=0), v1, v2
            )

        def split(feats):
            return (
                {m: v[: batch_samples] for m, v in feats.items()},
                {m: v[batch_samples:] for m, v in feats.items()},
            )

        return fuse, split

    mesh = mesh_plan.mesh
    cat2 = jax.shard_map(
        lambda a, c: jnp.concatenate([a, c], axis=0),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
    )
    halve = jax.shard_map(
        lambda x: (x[: x.shape[0] // 2], x[x.shape[0] // 2 :]),
        mesh=mesh, in_specs=P("data"), out_specs=(P("data"), P("data")),
    )

    def fuse(v1, v2):
        return jax.tree_util.tree_map(cat2, v1, v2)

    def split(feats):
        halves = {m: halve(v) for m, v in feats.items()}
        return {m: h[0] for m, h in halves.items()}, {m: h[1] for m, h in halves.items()}

    return fuse, split


def make_local_perm(mesh, n_local):
    """Per-device permutations of local row space: (seeds[n_dev]) ->
    [n_dev, n_local], row d a permutation drawn from seed d."""

    def body(seed):
        return jax.random.permutation(jax.random.key(seed[0]), n_local)[None]

    return jax.shard_map(body, mesh=mesh, in_specs=P("data"), out_specs=P("data"))


def make_local_gather(mesh, per_local, group=1, with_labels=False):
    """Sharded batch gather: (data, perm[n_dev, n_local], i) -> batch.

    Each device takes rows perm_local[i*per_local:(i+1)*per_local] from its
    OWN shard; with group>1 (sequence batching) each selected unit j expands
    to rows [j*group, (j+1)*group) — subsequences are stored contiguously in
    the grouped layout. Output is the global batch sharded on axis 0.
    """

    def body(data, perm, i, *labels):
        sel = jax.lax.dynamic_slice(perm[0], (i[0] * per_local,), (per_local,))
        if group > 1:
            idx = (sel[:, None] * group + jnp.arange(group)).reshape(-1)
        else:
            idx = sel
        batch = jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), data)
        if labels:
            return batch, jnp.take(labels[0], idx, axis=0)
        return batch

    data_spec = P("data")
    in_specs = (data_spec, data_spec, P()) + ((data_spec,) if with_labels else ())
    out_specs = (data_spec, data_spec) if with_labels else data_spec
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _apply_train(model, state, freq_x, dropout_rng, head):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out, mutated = model.apply(
        variables,
        freq_x,
        train=True,
        head=head,
        rngs={"dropout": dropout_rng},
        mutable=["batch_stats"],
    )
    return out, mutated["batch_stats"]


def make_supervised_train_step(model, augmenter, mesh_plan=None, state_shardings=None):
    """(state, data, labels, idx, rng) -> (state, metrics). Used by both
    supervised training and finetuning (finetune differs only in augmentation:
    'no' instead of 'fixed'; reference: finetune.py:54-67)."""

    fixed = augmenter.fixed

    def step(state, data, labels, idx, rng):
        rng_aug, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        batch = gather_batch(data, idx)
        batch_labels = jnp.take(labels, idx, axis=0)
        freq_x, targets = fixed(rng_aug, batch, batch_labels)

        def loss_fn(params):
            out, new_stats = _apply_train(
                model, state.replace(params=params), freq_x, rng_drop, "class"
            )
            return cross_entropy(out, targets), (out, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        hard = targets.argmax(-1) if targets.ndim > 1 else targets
        acc = jnp.mean((logits.argmax(-1) == hard).astype(jnp.float32))
        return state, {"loss": loss, "acc": acc}

    return _maybe_shard(step, mesh_plan, state_shardings=state_shardings)


def make_pretrain_step(model, augmenter, focal_loss, mesh_plan=None, fused_views=True,
                       state_shardings=None):
    """FOCAL pretraining: two random views -> projector features -> loss
    (reference: loss_calc_utils.py:1-22 + pretrain.py:62-74).

    fused_views runs both views through the backbone as ONE [2B] batch —
    double the matmul batch for the MXU and half the fixed per-call cost.
    BatchNorm then normalises over the joint views instead of each view
    sequentially (the reference runs two separate forwards); disable for
    strict reference statistics.
    """

    def step(state, data, idx, rng):
        base = jax.random.fold_in(rng, state.step)
        rng_v1, rng_v2, rng_drop1, rng_drop2 = jax.random.split(base, 4)
        batch = gather_batch(data, idx)
        view1 = augmenter.random(rng_v1, batch)
        view2 = augmenter.random(rng_v2, batch)

        if fused_views:
            b = idx.shape[0]
            both = jax.tree_util.tree_map(
                lambda a, c: jnp.concatenate([a, c], axis=0), view1, view2
            )

            def loss_fn(params):
                feats, new_stats = _apply_train(
                    model, state.replace(params=params), both, rng_drop1, "proj"
                )
                f1 = {m: v[:b] for m, v in feats.items()}
                f2 = {m: v[b:] for m, v in feats.items()}
                loss, parts = focal_loss(f1, f2)
                return loss, (parts, new_stats)

        else:

            def loss_fn(params):
                f1, stats1 = _apply_train(model, state.replace(params=params), view1, rng_drop1, "proj")
                st = state.replace(params=params, batch_stats=stats1)
                f2, stats2 = _apply_train(model, st, view2, rng_drop2, "proj")
                loss, parts = focal_loss(f1, f2)
                return loss, (parts, stats2)

        (loss, (parts, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, **parts}

    return _maybe_shard(step, mesh_plan, has_labels=False, state_shardings=state_shardings)


def _shard_batch(batch, mesh_plan):
    if mesh_plan is None:
        return batch
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(a, mesh_plan.batch_sharded), batch
    )


def make_micro_features(model, fuse_views, split_views, fused_views):
    """(params, batch_stats, view1, view2, rng_drop) -> (f1, f2, new_stats)
    for one micro-batch. Train-mode BatchNorm normalises with batch
    statistics, so f1/f2 do not depend on batch_stats — the gathered-accum
    pass 2 may recompute with any stats value."""

    def micro_features(params, batch_stats, view1, view2, rng_drop):
        from types import SimpleNamespace

        st = SimpleNamespace(params=params, batch_stats=batch_stats)
        if fused_views:
            both = fuse_views(view1, view2)
            feats, new_stats = _apply_train(model, st, both, rng_drop, "proj")
            f1, f2 = split_views(feats)
            return f1, f2, new_stats
        f1, stats1 = _apply_train(model, st, view1, rng_drop, "proj")
        st2 = SimpleNamespace(params=params, batch_stats=stats1)
        f2, stats2 = _apply_train(model, st2, view2,
                                  jax.random.fold_in(rng_drop, 1), "proj")
        return f1, f2, stats2

    return micro_features


def gathered_accum_update(focal_loss, micro_features, views_of, state, micro_ids):
    """One EFFECTIVE GradCache step over ``micro_ids``: gather projector
    features per micro-batch (pass 1), ONE concatenated FOCAL loss over the
    effective batch (negatives/ranking span it), then recompute each
    micro-forward under jax.vjp and pull the feature cotangents back into
    parameter gradients (pass 2). ``views_of(i)`` must be deterministic in i
    — pass 2 rebuilds the exact views pass 1 saw. Shared by the
    device-resident epoch fn and the streaming blocks."""

    # ---- pass 1: features only (activations freed per micro-batch)
    def collect(stats, i):
        view1, view2, rng_drop = views_of(i)
        f1, f2, new_stats = micro_features(state.params, stats, view1, view2, rng_drop)
        return new_stats, (f1, f2)

    new_stats, (f1s, f2s) = jax.lax.scan(collect, state.batch_stats, micro_ids)

    # ---- the large-batch loss on concatenated features
    def loss_of_feats(stacked):
        s1, s2 = stacked
        F1 = {m: v.reshape((-1,) + v.shape[2:]) for m, v in s1.items()}
        F2 = {m: v.reshape((-1,) + v.shape[2:]) for m, v in s2.items()}
        loss, _ = focal_loss(F1, F2)
        return loss

    loss, gfeats = jax.value_and_grad(loss_of_feats)((f1s, f2s))
    gf1s, gf2s = gfeats

    # ---- pass 2: recompute each micro-forward under vjp, pull the
    # feature cotangents back into param grads, sum
    def backprop(acc, args_i):
        i, gf1, gf2 = args_i
        view1, view2, rng_drop = views_of(i)

        def fwd(params):
            f1, f2, _ = micro_features(params, state.batch_stats, view1, view2, rng_drop)
            return f1, f2

        _, vjp_fn = jax.vjp(fwd, state.params)
        (g,) = vjp_fn((gf1, gf2))
        return jax.tree_util.tree_map(jnp.add, acc, g), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    grads, _ = jax.lax.scan(backprop, zero, (micro_ids, gf1s, gf2s))
    return state.apply_gradients(grads=grads).replace(batch_stats=new_stats), loss


def make_pretrain_epoch_fn(model, augmenter, focal_loss, n_items, batch_size,
                           subseq_idx=None, mesh_plan=None, fused_views=True,
                           epochs_per_call=1, data_layout="replicated",
                           state_shardings=None, grad_accum=1, accum_gather=True,
                           aug_id_table=None, ragged_tail=False):
    """One jitted call per `epochs_per_call` EPOCHS: on-device shuffles + a
    nested lax.scan over (epochs, steps).

    Eliminates per-step host->device index transfers and per-call dispatch
    latency — on a tunneled TPU that overhead dwarfs the 0.9 ms step itself.
    Shapes are static: steps_per_epoch = n_items // per (ragged tail dropped,
    matching the per-step loader). For sequence batching, pass subseq_idx
    [n_subseq, seq_len]; n_items then counts subsequences and batch_size is
    given in samples.

    data_layout="sharded" (multi-host): the split is row-sharded over the
    mesh in the per-device grouped order (parallel.distributed), n_items must
    be a multiple of the device count, shuffling is shard-local, and the
    gather runs under shard_map (no cross-device data movement). subseq_idx
    then only provides seq_len — the grouped layout stores subsequences
    contiguously.

    grad_accum=k>1 with accum_gather=True (the default) makes accumulated
    pretraining EQUIVALENT to the large contrastive batch via a
    GradCache-style two-pass step (Gao et al. 2021, "Scaling Deep Contrastive
    Learning Batch Size under Memory Limited Setup"): pass 1 runs the k
    micro-forwards and keeps only the projector features ([B, 256] per mod —
    cheap); the 4-term FOCAL loss is computed ONCE on the concatenated
    [k*B] features, so InfoNCE negatives and the temporal-ranking matrix span
    the full effective batch (reference negatives structure:
    /root/reference/src/models/loss.py:48-87); pass 2 recomputes each
    micro-forward under jax.vjp with the SAME dropout keys and pulls the
    feature cotangents back into parameter gradients, summed across
    micro-batches. Exactly the large-batch gradient at one micro-batch's
    activation memory + one param-sized accumulator, for ~1 extra forward per
    micro-batch. BatchNorm batch statistics remain per-micro-batch (they
    don't affect train-mode outputs). The optimizer must NOT be wrapped in
    MultiSteps (build_optimizer(accum_in_step=True)); `state.step` counts
    effective updates. The ragged micro-step tail of each epoch is dropped,
    so accumulation cycles never straddle epochs.

    accum_gather=False: per-micro-batch losses, plain MultiSteps averaging
    (negatives stay per-micro-batch).

    aug_id_table (attribution arm -py_aug_draws): int32 [epochs, steps, 2] of
    host-drawn augmenter indices; step (epoch, i) applies table[epoch, i, v]
    to view v instead of the keyed on-device draw.

    ragged_tail (attribution arm -ragged_tail): after the full-batch steps,
    run ONE extra update on the epoch permutation's leftover n_items % per
    units — the reference's BatchSeqSampler yields this partial batch
    (multi_modal_dataloader.py:66-77); the default here drops it (static
    shapes). The tail step is a second static shape, so it compiles once.
    Replicated layout + grad_accum=1 only.

    Returns run(state, data, rng) -> (state, mean_loss over the block).
    """
    if subseq_idx is not None:
        seq_len = subseq_idx.shape[1]
        per = max(1, batch_size // seq_len)
    else:
        seq_len = 1
        per = batch_size
    sharded = data_layout == "sharded"
    if sharded:
        if mesh_plan is None:
            raise ValueError("data_layout='sharded' requires a mesh plan")
        if mesh_plan.mp > 1:
            raise ValueError("data_layout='sharded' is DP-only; use replicated data with TP")
        n_dev = mesh_plan.dp
        if n_items % n_dev or per % n_dev:
            raise ValueError(
                f"sharded layout needs n_items ({n_items}) and batch units "
                f"({per}) divisible by the device count ({n_dev})"
            )
        n_local, per_local = n_items // n_dev, per // n_dev
        steps_per_epoch = max(1, n_local // per_local)
        local_perm = make_local_perm(mesh_plan.mesh, n_local)
        local_gather = make_local_gather(mesh_plan.mesh, per_local, group=seq_len)
    else:
        steps_per_epoch = max(1, n_items // per)
    gathered_accum = grad_accum > 1 and accum_gather
    if gathered_accum and steps_per_epoch < grad_accum:
        raise ValueError(
            f"-grad_accum {grad_accum} exceeds the {steps_per_epoch} steps per "
            "epoch; lower -grad_accum or -batch_size"
        )
    tail_units = 0 if sharded else n_items % per
    if ragged_tail and (sharded or grad_accum > 1):
        raise ValueError("-ragged_tail supports the replicated layout with grad_accum=1 only")
    # a 1-subsequence tail is degenerate: the temporal ranking loss has zero
    # inter-subsequence pairs (mean of an empty set -> NaN — the reference's
    # own loss.py:108-137 NaNs identically on such a tail batch), so it is
    # dropped even under -ragged_tail
    tail_active = ragged_tail and (tail_units >= 2 if subseq_idx is not None else tail_units > 0)
    eff_steps_per_epoch = steps_per_epoch // grad_accum if gathered_accum else steps_per_epoch
    # state.step advances once per update; with the tail step each epoch makes
    # one extra update, so the epoch derivation divides by the larger count
    updates_per_epoch = eff_steps_per_epoch + (1 if tail_active else 0)
    fuse_views, split_views = make_view_fuser(mesh_plan, per * seq_len, seq_len)
    aug_table = None if aug_id_table is None else jnp.asarray(aug_id_table, jnp.int32)

    def micro_batch(data, subseq_rows, perm, i):
        """Gather micro-step i's batch + derive its two augmented views'
        rng keys. Deterministic in (perm, i): pass 2 of the gathered
        accumulation recomputes it bit-identically."""
        if sharded:
            return local_gather(data, perm, i[None])
        sel = jax.lax.dynamic_slice(perm, (i * per,), (per,))
        if subseq_rows is not None:
            idx = jnp.take(subseq_rows, sel, axis=0).reshape(-1)
        else:
            idx = sel
        return _shard_batch(gather_batch(data, idx), mesh_plan)

    def micro_views(data, subseq_rows, perm, step_rng, i, epoch=None):
        batch = micro_batch(data, subseq_rows, perm, i)
        return _views_of(batch, step_rng, i, epoch)

    def _views_of(batch, step_rng, i, epoch):
        rng_v1, rng_v2, rng_drop = jax.random.split(jax.random.fold_in(step_rng, i), 3)
        a1 = a2 = None
        if aug_table is not None:
            ids = aug_table[epoch, i]
            a1, a2 = ids[0], ids[1]
        view1 = augmenter.random(rng_v1, batch, force_aug_id=a1)
        view2 = augmenter.random(rng_v2, batch, force_aug_id=a2)
        return view1, view2, rng_drop

    micro_features = make_micro_features(model, fuse_views, split_views, fused_views)

    def accum_body(state, e, data, subseq_rows, perm, step_rng, epoch=None):
        """One EFFECTIVE step: gather features over grad_accum micro-batches,
        one concatenated FOCAL loss, vjp recompute, one update
        (gathered_accum_update)."""
        micro_ids = e * grad_accum + jnp.arange(grad_accum)
        views_of = lambda i: micro_views(data, subseq_rows, perm, step_rng, i, epoch)
        return gathered_accum_update(focal_loss, micro_features, views_of, state, micro_ids)

    def _tail_step(state, data, subseq_rows, perm, step_rng, epoch):
        """The reference sampler's ragged final batch: one update on the
        permutation's leftover tail_units subsequences (a SMALLER static
        shape — contrastive negatives only span this partial batch, exactly
        like the reference's BatchSeqSampler tail)."""
        sel = jax.lax.dynamic_slice(perm, (steps_per_epoch * per,), (tail_units,))
        if subseq_rows is not None:
            idx = jnp.take(subseq_rows, sel, axis=0).reshape(-1)
        else:
            idx = sel
        batch = _shard_batch(gather_batch(data, idx), mesh_plan)
        view1, view2, rng_drop = _views_of(batch, step_rng, steps_per_epoch, epoch)
        tfuse, tsplit = make_view_fuser(mesh_plan, tail_units * seq_len, seq_len)

        def loss_fn(params):
            from types import SimpleNamespace

            st = SimpleNamespace(params=params, batch_stats=state.batch_stats)
            if fused_views:
                both = tfuse(view1, view2)
                feats, new_stats = _apply_train(model, st, both, rng_drop, "proj")
                f1, f2 = tsplit(feats)
            else:
                f1, stats1 = _apply_train(model, st, view1, rng_drop, "proj")
                st2 = SimpleNamespace(params=params, batch_stats=stats1)
                f2, new_stats = _apply_train(model, st2, view2,
                                             jax.random.fold_in(rng_drop, 1), "proj")
            loss, _ = focal_loss(f1, f2)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads).replace(batch_stats=new_stats), loss

    def one_epoch(state, data, subseq_rows, rng):
        # epoch index derives from the optimizer step counter: no per-call
        # host scalar crosses the tunnel
        epoch = state.step // updates_per_epoch
        perm_rng, step_rng = jax.random.split(jax.random.fold_in(rng, epoch))
        if sharded:
            seeds = jax.random.randint(
                perm_rng, (mesh_plan.dp,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            perm = local_perm(seeds)
        else:
            perm = jax.random.permutation(perm_rng, n_items)

        if gathered_accum:
            def eff_body(state, e):
                return accum_body(state, e, data, subseq_rows, perm, step_rng, epoch)

            state, losses = jax.lax.scan(eff_body, state, jnp.arange(eff_steps_per_epoch))
            return state, jnp.mean(losses)

        def body(state, i):
            view1, view2, rng_drop = micro_views(data, subseq_rows, perm, step_rng, i, epoch)

            def loss_fn(params):
                f1, f2, new_stats = micro_features(params, state.batch_stats, view1, view2, rng_drop)
                loss, _ = focal_loss(f1, f2)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, jnp.arange(steps_per_epoch))
        if tail_active:
            state, tail_loss = _tail_step(state, data, subseq_rows, perm, step_rng, epoch)
            # mean over ALL updates, weighting the tail like any other step
            # (it is one update of updates_per_epoch)
            return state, (jnp.sum(losses) + tail_loss) / updates_per_epoch
        return state, jnp.mean(losses)

    def epoch_fn(state, data, subseq_rows, rng):
        if epochs_per_call == 1:
            return one_epoch(state, data, subseq_rows, rng)

        def outer(state, _):
            return one_epoch(state, data, subseq_rows, rng)

        state, losses = jax.lax.scan(outer, state, jnp.arange(epochs_per_call))
        return state, jnp.mean(losses)

    if mesh_plan is None:
        jitted = jax.jit(epoch_fn, donate_argnums=(0,))
    else:
        r = mesh_plan.replicated
        s = state_shardings if state_shardings is not None else r
        d = mesh_plan.batch_sharded if sharded else r
        jitted = jax.jit(epoch_fn, in_shardings=(s, d, r, r), out_shardings=(s, r),
                         donate_argnums=(0,))

    # the subsequence table and rng go to the device ONCE; every epoch-call
    # argument after that is already device-resident
    from focal_tpu.parallel.distributed import put_replicated_global

    rows = (
        None
        if (subseq_idx is None or sharded)  # grouped layout stores subsequences contiguously
        else put_replicated_global(jnp.asarray(subseq_idx), mesh_plan)
    )
    # cache holds the host key object too: keying by id() alone is unsafe
    # because CPython reuses freed addresses for per-call temporary keys
    rng_cache = {}

    def run(state, data, rng):
        entry = rng_cache.get(id(rng))
        if entry is None or entry[0] is not rng:
            rng_cache.clear()
            rng_cache[id(rng)] = (rng, put_replicated_global(rng, mesh_plan))
        return jitted(state, data, rows, rng_cache[id(rng)][1])

    run.steps_per_epoch = eff_steps_per_epoch
    run.epochs_per_call = epochs_per_call
    run.windows_per_epoch = (
        eff_steps_per_epoch * grad_accum * per * seq_len if gathered_accum
        else steps_per_epoch * per * seq_len
    ) + (tail_units * seq_len if tail_active else 0)
    return run


def make_classifier_epoch_fn(model, augmenter, n_items, batch_size, fixed_aug=True, mesh_plan=None,
                             epochs_per_call=1, data_layout="replicated",
                             state_shardings=None):
    """Epoch-scan for supervised/finetune training (fixed_aug=False -> no-aug
    pipeline, i.e. finetune). Returns run(state, data, labels, rng); with
    epochs_per_call > 1 each call advances that many epochs (nested scan).
    data_layout="sharded": see make_pretrain_epoch_fn."""
    per = min(batch_size, n_items)
    sharded = data_layout == "sharded"
    if sharded:
        if mesh_plan is None:
            raise ValueError("data_layout='sharded' requires a mesh plan")
        if mesh_plan.mp > 1:
            raise ValueError("data_layout='sharded' is DP-only; use replicated data with TP")
        n_dev = mesh_plan.dp
        if n_items % n_dev or per % n_dev:
            raise ValueError(
                f"sharded layout needs n_items ({n_items}) and batch size "
                f"({per}) divisible by the device count ({n_dev})"
            )
        n_local, per_local = n_items // n_dev, per // n_dev
        steps_per_epoch = max(1, n_local // per_local)
        local_perm = make_local_perm(mesh_plan.mesh, n_local)
        local_gather = make_local_gather(mesh_plan.mesh, per_local, with_labels=True)
    else:
        steps_per_epoch = max(1, n_items // per)

    def one_epoch(state, data, labels, rng):
        epoch = state.step // steps_per_epoch
        perm_rng, step_rng = jax.random.split(jax.random.fold_in(rng, epoch))
        if sharded:
            seeds = jax.random.randint(
                perm_rng, (mesh_plan.dp,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            perm = local_perm(seeds)
        else:
            perm = jax.random.permutation(perm_rng, n_items)

        def body(state, i):
            if sharded:
                batch, batch_labels = local_gather(data, perm, i[None], labels)
            else:
                idx = jax.lax.dynamic_slice(perm, (i * per,), (per,))
                batch = _shard_batch(gather_batch(data, idx), mesh_plan)
                batch_labels = jnp.take(labels, idx, axis=0)
            rng_aug, rng_drop = jax.random.split(jax.random.fold_in(step_rng, i))
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
            new_state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
            hard = targets.argmax(-1) if targets.ndim > 1 else targets
            acc = jnp.mean((logits.argmax(-1) == hard).astype(jnp.float32))
            return new_state, (loss, acc)

        state, (losses, accs) = jax.lax.scan(body, state, jnp.arange(steps_per_epoch))
        return state, jnp.mean(losses), jnp.mean(accs)

    def epoch_fn(state, data, labels, rng):
        if epochs_per_call == 1:
            return one_epoch(state, data, labels, rng)

        def outer(state, _):
            st, loss, acc = one_epoch(state, data, labels, rng)
            return st, (loss, acc)

        state, (losses, accs) = jax.lax.scan(outer, state, jnp.arange(epochs_per_call))
        return state, jnp.mean(losses), jnp.mean(accs)

    if mesh_plan is None:
        jitted = jax.jit(epoch_fn, donate_argnums=(0,))
    else:
        r = mesh_plan.replicated
        s = state_shardings if state_shardings is not None else r
        d = mesh_plan.batch_sharded if sharded else r
        jitted = jax.jit(epoch_fn, in_shardings=(s, d, d, r), out_shardings=(s, r, r),
                         donate_argnums=(0,))

    from focal_tpu.parallel.distributed import put_replicated_global

    rng_cache = {}

    def run(state, data, labels, rng):
        entry = rng_cache.get(id(rng))
        if entry is None or entry[0] is not rng:
            rng_cache.clear()
            rng_cache[id(rng)] = (rng, put_replicated_global(rng, mesh_plan))
        return jitted(state, data, labels, rng_cache[id(rng)][1])

    run.steps_per_epoch = steps_per_epoch
    run.epochs_per_call = epochs_per_call
    run.windows_per_epoch = steps_per_epoch * per
    return run


def _maybe_shard(step, mesh_plan, has_labels=True, state_shardings=None):
    """jit the step; with a mesh plan, shard batch indices over the data axis
    and keep state replicated — or TP-sharded when a state sharding tree is
    given (parallel/tp.py). donate the state for in-place updates."""
    if mesh_plan is None:
        return jax.jit(step, donate_argnums=(0,))
    r, b = mesh_plan.replicated, mesh_plan.batch_sharded
    s = state_shardings if state_shardings is not None else r
    if has_labels:
        in_shardings = (s, r, r, b, r)
    else:
        in_shardings = (s, r, b, r)
    # pin the output state to the input layout: stable across steps and
    # required for in-place donation of TP-sharded buffers
    return jax.jit(step, in_shardings=in_shardings, out_shardings=(s, r),
                   donate_argnums=(0,))
