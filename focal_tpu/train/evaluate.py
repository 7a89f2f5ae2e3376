"""Evaluation: task metrics, supervised eval, KNN-probe eval
(reference: src/train_utils/eval_functions.py:11-131, src/train_utils/knn.py).
Metrics run host-side in numpy/sklearn; the forward passes are jitted."""

import logging

import jax
import numpy as np
from sklearn.metrics import accuracy_score, confusion_matrix, f1_score

from focal_tpu.ops.knn import make_knn
from focal_tpu.train.losses import cross_entropy


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


def eval_supervised(args, state, eval_step, loader, data, labels):
    """No-aug forward over a split -> (mean loss, (acc, f1, confusion))."""
    losses, preds, labs, weights = [], [], [], []
    for plan in loader:
        logits = eval_step(state, data, plan.idx)
        logits = np.asarray(jax.device_get(logits), dtype=np.float32)
        y = np.asarray(loader.dataset.labels[plan.idx])
        w = plan.weight
        losses.append(float(cross_entropy(logits, y, weight=w)))
        keep = w > 0
        preds.append(logits.argmax(-1)[keep])
        labs.append(y[keep])
        weights.append(w)
    mean_loss = float(np.mean(losses))
    metrics = eval_task_metrics(args, np.concatenate(labs), np.concatenate(preds))
    return mean_loss, metrics


def extract_features(state, eval_step, loader, data):
    """Concatenated per-mod encoder features for the KNN probe
    (reference: knn.py:7-20: class_head=False, no projection)."""
    feats, labs = [], []
    for plan in loader:
        mod_feats = eval_step(state, data, plan.idx)  # {mod: [B, d]}
        stacked = np.concatenate(
            [np.asarray(jax.device_get(mod_feats[m]), np.float32) for m in sorted(mod_feats)], axis=1
        )
        keep = plan.weight > 0
        feats.append(stacked[keep])
        labs.append(loader.dataset.labels[plan.idx][keep])
    return np.concatenate(feats), np.concatenate(labs)


def compute_knn(state, feat_step, train_loader, train_data, backend="sklearn"):
    """Fit the KNN probe on train features (reference: knn.py:22-42).
    backend 'jnp' runs neighbour search on device."""
    feats, labs = extract_features(state, feat_step, train_loader, train_data)
    estimator = make_knn(backend)
    estimator.fit(feats, labs)
    return estimator


def eval_pretrained(args, state, feat_step, loss_step, estimator, loader, data, rng):
    """Pretrain loss + KNN predictions on a split
    (reference: eval_functions.py:65-97)."""
    losses = []
    for i, plan in enumerate(loader):
        losses.append(float(loss_step(state, data, plan.idx, jax.random.fold_in(rng, i))))
    feats, labs = extract_features(state, feat_step, loader, data)
    preds = estimator.predict(feats)
    metrics = eval_task_metrics(args, labs, preds)
    return float(np.mean(losses)), metrics


def log_val_test(stage, epoch, val_loss, val_metrics, test_loss, test_metrics):
    logging.info(f"[{stage}] epoch {epoch}: val loss {val_loss:.5f}")
    logging.info(f"Val acc: {val_metrics[0]:.5f}, val f1: {val_metrics[1]:.5f}")
    logging.info(f"Val confusion matrix:\n {val_metrics[2]}")
    logging.info(f"Test loss: {test_loss:.5f}")
    logging.info(f"Test acc: {test_metrics[0]:.5f}, test f1: {test_metrics[1]:.5f}")
    logging.info(f"Test confusion matrix:\n {test_metrics[2]}")
