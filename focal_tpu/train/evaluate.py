"""Evaluation: task metrics, supervised eval, KNN-probe eval
(reference: src/train_utils/eval_functions.py:11-131, src/train_utils/knn.py).

Forward passes over a whole split run as ONE jitted call (lax.scan over a
precomputed [n_batches, B] index matrix) — per-batch dispatch through a
tunneled TPU dominates otherwise. Metrics run host-side in numpy/sklearn."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.metrics import accuracy_score, confusion_matrix, f1_score

from focal_tpu.ops.knn import make_knn
from focal_tpu.train.steps import _shard_batch, gather_batch


class EvalPlan:
    """Static batch schedule for one split: device-resident index matrix
    [nb, B] plus host-side validity weights [nb, B]."""

    def __init__(self, loader, mesh_plan=None):
        from focal_tpu.parallel.distributed import put_replicated_global

        plans = list(loader)
        self.idx = np.stack([p.idx for p in plans])  # [nb, B]
        self.weight = np.stack([p.weight for p in plans])  # [nb, B]
        self.device_idx = put_replicated_global(jnp.asarray(self.idx), mesh_plan)
        self.labels = loader.dataset.labels[self.idx]  # [nb, B]


def make_batched_forward(model, augmenter, head, mesh_plan=None, state_shardings=None):
    """(state, data, idx_matrix[nb, B]) -> outputs stacked over batches,
    computed in one device call. state_shardings: TP-sharded state layout
    (parallel/tp.py) so eval accepts the training state without resharding."""

    def fn(state, data, idx_matrix):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(_, idx):
            batch = _shard_batch(gather_batch(data, idx), mesh_plan)
            freq_x = augmenter.no(batch)
            return None, model.apply(variables, freq_x, train=False, head=head)

        _, outs = jax.lax.scan(body, None, idx_matrix)
        return outs

    if mesh_plan is None:
        return jax.jit(fn)
    r = mesh_plan.replicated
    s = state_shardings if state_shardings is not None else r
    # outputs replicated: metrics are computed host-side, and on a
    # multi-process mesh only fully-replicated arrays are fetchable
    return jax.jit(fn, in_shardings=(s, r, r), out_shardings=r)


class ShardedEvalPlan:
    """Full-coverage batch schedule over a ROW-SHARDED split (multi-host
    data layout): batch b is each device's local rows [b*L, (b+1)*L), so the
    gather never crosses devices. Batch composition therefore differs from
    the replicated plan's sequential order (deliberate, documented deviation
    for the sharded layout); coverage and per-row weights are identical.

    labels_grouped: [n_dev, n_local_rows] host labels in the grouped
    (device-major) placement order."""

    def __init__(self, labels_grouped, batch_size, mesh_plan):
        n_dev, n_local = labels_grouped.shape
        L = max(1, batch_size // n_dev)
        nb = int(np.ceil(n_local / L))
        idx = np.arange(nb * L) % n_local  # pad tail by wrapping (weight 0)
        idx = idx.reshape(nb, L).astype(np.int32)
        wloc = (np.arange(nb * L) < n_local).reshape(nb, L)
        # batch order after the shard_map gather: device-major concat
        self.idx = idx
        self.weight = np.repeat(wloc[:, None, :], n_dev, axis=1).reshape(nb, n_dev * L)
        self.labels = np.stack(
            [labels_grouped[:, idx[b]].reshape(-1) for b in range(nb)]
        )  # [nb, n_dev * L]
        from focal_tpu.parallel.distributed import put_replicated_global

        self.device_idx = put_replicated_global(jnp.asarray(idx), mesh_plan)


def make_sharded_batched_forward(model, augmenter, head, mesh_plan):
    """Batched no-aug forward over a row-sharded split: idx_matrix holds
    LOCAL row positions (identical on every device); each device gathers
    from its own shard under shard_map."""
    from jax.sharding import PartitionSpec as P

    gather = jax.shard_map(
        lambda d, idx: jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), d),
        mesh=mesh_plan.mesh,
        in_specs=(P("data"), P()),
        out_specs=P("data"),
    )

    def fn(state, data, idx_matrix):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(_, idx):
            freq_x = augmenter.no(gather(data, idx))
            return None, model.apply(variables, freq_x, train=False, head=head)

        _, outs = jax.lax.scan(body, None, idx_matrix)
        return outs

    r = mesh_plan.replicated
    return jax.jit(fn, in_shardings=(r, mesh_plan.batch_sharded, r), out_shardings=r)


def eval_task_metrics(args, labels, predictions):
    """Accuracy (ordinal 'closeness' variant for distance/speed), macro-F1,
    confusion matrix (reference: eval_functions.py:11-27)."""
    labels = np.asarray(labels)
    predictions = np.asarray(predictions)
    if args.task in {"distance_classification", "speed_classification"}:
        num_classes = args.dataset_config[args.task]["num_classes"]
        closeness = 1 - (np.abs(labels - predictions) / np.maximum(labels, (num_classes - 1) - labels))
        closeness = np.nan_to_num(closeness, nan=1.0)
        mean_acc = closeness.mean()
    else:
        mean_acc = accuracy_score(labels, predictions)
    mean_f1 = f1_score(labels, predictions, average="macro", zero_division=1)
    try:
        conf = confusion_matrix(labels, predictions)
    except Exception:
        conf = []
    return mean_acc, mean_f1, conf


def _np_cross_entropy(logits, labels, weight):
    """Weighted mean CE in numpy on [B, C] host arrays."""
    shifted = logits - logits.max(axis=-1, keepdims=True)
    logp = shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    per = -logp[np.arange(len(labels)), labels]
    return float((per * weight).sum() / max(weight.sum(), 1.0))


def eval_supervised(args, state, fwd_class, plan, data):
    """No-aug forward over a split -> (mean loss, (acc, f1, confusion)),
    or (mean MSE loss, (mse,)) for a regression task.

    Loss is the mean of per-batch weighted means, matching the reference's
    one-loss-per-batch accumulation (eval_functions.py:29-55). Regression
    branch (reference surface: test.py:39-41, supervised_train.py:44):
    deliberate deviation — the reference still argmaxes and prints that value
    as "mse"; here the head's first output regresses the label and real MSE
    is reported."""
    logits = np.asarray(jax.device_get(fwd_class(state, data, plan.device_idx)), np.float32)
    if "regression" in args.task:
        preds = logits[..., 0] if logits.ndim == 3 else logits  # [nb, B]
        y = plan.labels.astype(np.float32)
        w = plan.weight
        batch_mse = [
            float(((preds[b] - y[b]) ** 2 * w[b]).sum() / max(w[b].sum(), 1.0))
            for b in range(preds.shape[0])
        ]
        mean_loss = float(np.mean(batch_mse))
        keep = plan.weight.reshape(-1) > 0
        mse = float(((preds.reshape(-1) - y.reshape(-1))[keep] ** 2).mean())
        return mean_loss, (mse,)
    batch_losses = [
        _np_cross_entropy(logits[b], plan.labels[b], plan.weight[b])
        for b in range(logits.shape[0])
    ]
    mean_loss = float(np.mean(batch_losses))
    flat = logits.reshape(-1, logits.shape[-1])
    y = plan.labels.reshape(-1)
    keep = plan.weight.reshape(-1) > 0
    metrics = eval_task_metrics(args, y[keep], flat.argmax(-1)[keep])
    return mean_loss, metrics


def extract_features(state, fwd_feat, plan, data):
    """Concatenated per-mod encoder features for the KNN probe
    (reference: knn.py:7-20: class_head=False, no projection)."""
    mod_feats = fwd_feat(state, data, plan.device_idx)  # {mod: [nb, B, d]}
    stacked = np.concatenate(
        [np.asarray(jax.device_get(mod_feats[m]), np.float32) for m in sorted(mod_feats)], axis=-1
    )
    stacked = stacked.reshape(-1, stacked.shape[-1])
    keep = plan.weight.reshape(-1) > 0
    return stacked[keep], plan.labels.reshape(-1)[keep]


def compute_knn(state, fwd_feat, plan, train_data, backend="sklearn"):
    """Fit the KNN probe on train features (reference: knn.py:22-42).
    backend 'jnp' runs neighbour search on device."""
    feats, labs = extract_features(state, fwd_feat, plan, train_data)
    estimator = make_knn(backend)
    estimator.fit(feats, labs)
    return estimator


def make_batched_pretrain_loss(model, augmenter, focal_loss, mesh_plan=None, state_shardings=None):
    """Mean pretrain loss over a split in one device call
    (reference: eval_functions.py:65-80 reuses calc_pretrain_loss)."""

    def fn(state, data, idx_matrix, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def body(_, inp):
            i, idx = inp
            batch = _shard_batch(gather_batch(data, idx), mesh_plan)
            r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
            f1 = model.apply(variables, augmenter.random(r1, batch), train=False, head="proj")
            f2 = model.apply(variables, augmenter.random(r2, batch), train=False, head="proj")
            loss, _ = focal_loss(f1, f2)
            return None, loss

        nb = idx_matrix.shape[0]
        _, losses = jax.lax.scan(body, None, (jnp.arange(nb), idx_matrix))
        return jnp.mean(losses)

    if mesh_plan is None:
        return jax.jit(fn)
    r = mesh_plan.replicated
    s = state_shardings if state_shardings is not None else r
    return jax.jit(fn, in_shardings=(s, r, r, r), out_shardings=r)


def eval_pretrained(args, state, fwd_feat, loss_fn, estimator, plan, data, rng):
    """Pretrain loss + KNN predictions on a split
    (reference: eval_functions.py:65-97)."""
    mean_loss = float(jax.device_get(loss_fn(state, data, plan.device_idx, rng)))
    feats, labs = extract_features(state, fwd_feat, plan, data)
    preds = estimator.predict(feats)
    metrics = eval_task_metrics(args, labs, preds)
    return mean_loss, metrics


def log_val_test(stage, epoch, val_loss, val_metrics, test_loss, test_metrics):
    logging.info(f"[{stage}] epoch {epoch}: val loss {val_loss:.5f}")
    logging.info(f"Val acc: {val_metrics[0]:.5f}, val f1: {val_metrics[1]:.5f}")
    logging.info(f"Val confusion matrix:\n {val_metrics[2]}")
    logging.info(f"Test loss: {test_loss:.5f}")
    logging.info(f"Test acc: {test_metrics[0]:.5f}, test f1: {test_metrics[1]:.5f}")
    logging.info(f"Test confusion matrix:\n {test_metrics[2]}")
