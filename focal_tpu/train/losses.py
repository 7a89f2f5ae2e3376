"""Loss functions as pure jittable functions.

FOCAL objective parity (reference: src/models/loss.py:8-218):
  total = 1 * shared InfoNCE (cross-modality, per temporal slot)
        + 1 * private InfoNCE (cross-view, per modality)
        + 3 * orthogonality (shared vs private, private vs private)
        + 5 * temporal ranking (intra-seq distance < inter-seq distance)

All masks are static for a given (batch, seq) shape, so everything fuses into
the training step's XLA program. Loss math runs in float32.
"""

from functools import partial

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, weight=None):
    """Mean CE. Accepts integer labels [b] or soft targets [b, C]
    (reference supervised path: torch CrossEntropyLoss)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim:
        per = -jnp.sum(labels * logp, axis=-1)
    else:
        per = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if weight is None:
        return jnp.mean(per)
    weight = weight.astype(jnp.float32)
    return jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def _l2_normalize(x, eps=1e-12):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def info_nce(emb1, emb2, temperature, finegrain=False):
    """NT-Xent over paired temporal slots (reference: loss.py:48-87).

    emb1, emb2: [b, seq, d]. With finegrain=False the comparison dimension is
    the batch: for each temporal slot, 2b views form positives on the
    cross-view diagonals, negatives everywhere else except self.

    Implemented as -sim[r, partner] + logsumexp_{c != r}(sim[r, c]), which is
    exactly CE over [positive, 2N-2 negatives] logits.
    """
    if not finegrain:
        emb1 = jnp.swapaxes(emb1, 0, 1)  # [seq, b, d]
        emb2 = jnp.swapaxes(emb2, 0, 1)
    n = emb1.shape[1]
    z = _l2_normalize(jnp.concatenate([emb1, emb2], axis=1).astype(jnp.float32))  # [p, 2n, d]
    sim = jnp.einsum("pid,pjd->pij", z, z) / temperature  # [p, 2n, 2n]

    idx = jnp.arange(2 * n)
    partner = jnp.where(idx < n, idx + n, idx - n)
    pos = jnp.take_along_axis(sim, partner[None, :, None], axis=2)[..., 0]  # [p, 2n]

    self_mask = jnp.eye(2 * n, dtype=bool)[None]
    denom = jax.nn.logsumexp(jnp.where(self_mask, -jnp.inf, sim), axis=2)  # [p, 2n]
    return jnp.mean(denom - pos)


def orthogonality_loss(emb1, emb2):
    """CosineEmbeddingLoss with target=-1: mean(max(0, cos(x1, x2)))
    (reference: loss.py:89-106)."""
    f1 = _l2_normalize(emb1.reshape(-1, emb1.shape[-1]).astype(jnp.float32))
    f2 = _l2_normalize(emb2.reshape(-1, emb2.shape[-1]).astype(jnp.float32))
    cos = jnp.sum(f1 * f2, axis=-1)
    return jnp.mean(jnp.maximum(cos, 0.0))


def temporal_ranking_loss(emb, margin):
    """MarginRankingLoss(margin, y=-1) between mean intra-subsequence and
    inter-subsequence euclidean distances (reference: loss.py:108-137)."""
    n, seq, d = emb.shape
    flat = emb.reshape(n * seq, d).astype(jnp.float32)
    sq = jnp.sum(flat * flat, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * flat @ flat.T
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))  # [n*seq, n*seq]

    dist = dist.reshape(n, seq, n, seq).transpose(0, 2, 1, 3)  # [n, n, seq, seq]
    pair_mask = 1.0 - jnp.eye(n * seq)
    pair_mask = pair_mask.reshape(n, seq, n, seq).transpose(0, 2, 1, 3)
    seq_dist = jnp.sum(dist * pair_mask, axis=(2, 3)) / jnp.sum(pair_mask, axis=(2, 3))  # [n, n]

    intra = jnp.diagonal(seq_dist)  # [n]
    # pair each subsequence's intra distance with its n-1 inter distances
    # (reference repeats the diagonal n-1 times against the off-diagonals).
    # Masked arithmetic instead of an off-diagonal gather: TPU gathers run
    # ~1 element/cycle and this [n, n-1] gather (+ its scatter in the
    # backward) cost ~5 ms/step at batch 1024; the masked mean is identical.
    hinge = jnp.maximum(intra[:, None] - seq_dist + margin, 0.0)  # [n, n]
    off_diag = 1.0 - jnp.eye(n, dtype=hinge.dtype)
    return jnp.sum(hinge * off_diag) / (n * (n - 1))


def split_features(feat):
    """First half = shared space, second half = private space
    (reference: src/models/FOCALModules.py:37-59)."""
    d = feat.shape[-1] // 2
    return feat[..., :d], feat[..., d : 2 * d]


def make_focal_loss(args):
    """Build the FOCAL loss fn for this run's static config."""
    config = args.dataset_config["FOCAL"]
    modalities = list(args.dataset_config["modality_names"])
    seq_len = args.dataset_config["seq_len"]
    temp = config["temperature"]
    temperature = temp[args.model] if isinstance(temp, dict) else temp
    no_private = args.tag == "noPrivate"
    weights = (
        config["shared_contrastive_loss_weight"],
        config["private_contrastive_loss_weight"],
        config["orthogonal_loss_weight"],
        config["rank_loss_weight"],
    )
    margin = config["inter_rank_margin"]

    def loss_fn(mod_features1, mod_features2):
        """mod_features*: {mod: [B, dim]} with B = n_subseq * seq_len."""
        f1 = {m: mod_features1[m].reshape(-1, seq_len, mod_features1[m].shape[-1]) for m in modalities}
        f2 = {m: mod_features2[m].reshape(-1, seq_len, mod_features2[m].shape[-1]) for m in modalities}
        s1 = {m: split_features(f1[m]) for m in modalities}
        s2 = {m: split_features(f2[m]) for m in modalities}

        # shared space: cross-modality InfoNCE per view (reference: loss.py:161-178)
        shared = 0.0
        for view_full, view_split in ((f1, s1), (f2, s2)):
            for i, m1 in enumerate(modalities):
                for m2 in modalities[i + 1 :]:
                    if no_private:
                        shared += info_nce(view_full[m1], view_full[m2], temperature)
                    else:
                        shared += info_nce(view_split[m1][0], view_split[m2][0], temperature)

        # private space: cross-view InfoNCE per modality (loss.py:180-186)
        private = 0.0
        for m in modalities:
            private += info_nce(s1[m][1], s2[m][1], temperature)

        # temporal ranking on full features, both views (loss.py:188-192)
        rank = 0.0
        for view in (f1, f2):
            for m in modalities:
                rank += temporal_ranking_loss(view[m], margin)

        # orthogonality (loss.py:194-209)
        orth = 0.0
        for view in (s1, s2):
            for i, m in enumerate(modalities):
                orth += orthogonality_loss(view[m][0], view[m][1])
                for m2 in modalities[i + 1 :]:
                    orth += orthogonality_loss(view[m][1], view[m2][1])

        total = weights[0] * shared + weights[1] * private + weights[2] * orth + weights[3] * rank
        return total, {
            "shared": shared,
            "private": private,
            "orthogonality": orth,
            "ranking": rank,
        }

    return loss_fn
