"""KNN probe.

The reference validates contrastive pretraining with an sklearn
KNeighborsClassifier fit on frozen encoder features
(reference: src/train_utils/knn.py:22-42). That path exists in
focal_tpu.train.evaluate for parity; this module adds a jnp implementation
(batched pairwise distances + top-k vote) that runs on device — useful when
the feature set is large enough that host KNN dominates validation time.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "num_classes"))
def _knn_predict(queries, fit_x, fit_y, k, num_classes):
    sq_q = jnp.sum(queries**2, axis=1, keepdims=True)
    sq_f = jnp.sum(fit_x**2, axis=1)
    d2 = sq_q + sq_f[None, :] - 2.0 * queries @ fit_x.T
    _, nbr = jax.lax.top_k(-d2, k)
    votes = fit_y[nbr]  # [q, k]
    counts = jax.vmap(lambda v: jnp.bincount(v, length=num_classes))(votes)
    return jnp.argmax(counts, axis=1)


class JaxKNN:
    """Drop-in for the sklearn estimator's fit/predict surface
    (n_neighbors=5 uniform vote, euclidean — sklearn defaults). The predict
    kernel is a module-level jit (cached across probe instances — the probe
    is re-fit every validation epoch)."""

    def __init__(self, n_neighbors=5):
        self.n_neighbors = n_neighbors
        self._fit_x = None
        self._fit_y = None

    def fit(self, features, labels):
        self._fit_x = jnp.asarray(features, jnp.float32)
        self._fit_y = jnp.asarray(labels, jnp.int32)
        self._num_classes = int(self._fit_y.max()) + 1
        return self

    def predict(self, features):
        k = min(self.n_neighbors, self._fit_x.shape[0])
        out = _knn_predict(
            jnp.asarray(features, jnp.float32), self._fit_x, self._fit_y,
            k=k, num_classes=self._num_classes,
        )
        return np.asarray(jax.device_get(out))


def make_knn(backend="sklearn", n_neighbors=5):
    if backend == "jnp":
        return JaxKNN(n_neighbors)
    from sklearn.neighbors import KNeighborsClassifier

    return KNeighborsClassifier(n_neighbors=n_neighbors)
