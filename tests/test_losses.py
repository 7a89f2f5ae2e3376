import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focal_tpu.train import losses as L


def test_cross_entropy_int_vs_soft():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(8, 5)).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 5)
    hard = float(L.cross_entropy(logits, labels))
    soft = float(L.cross_entropy(logits, jax.nn.one_hot(labels, 5)))
    assert np.isclose(hard, soft, rtol=1e-6)
    # weighted: zero-weight rows drop out
    w = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    sub = float(L.cross_entropy(logits[:4], labels[:4]))
    assert np.isclose(float(L.cross_entropy(logits, labels, weight=w)), sub, rtol=1e-6)


def torch_style_info_nce(e1, e2, temperature):
    """Independent numpy replica of the reference NT-Xent
    (loss.py:48-87: cosine sim, cross-view diagonal positives, CE)."""
    e1 = np.swapaxes(e1, 0, 1)  # [seq, b, d]
    e2 = np.swapaxes(e2, 0, 1)
    seq, b, d = e1.shape
    z = np.concatenate([e1, e2], axis=1)
    zn = z / np.linalg.norm(z, axis=-1, keepdims=True)
    sim = np.einsum("pid,pjd->pij", zn, zn) / temperature
    N = 2 * b
    losses = []
    for p in range(seq):
        for r in range(N):
            partner = r + b if r < b else r - b
            pos = sim[p, r, partner]
            neg = [sim[p, r, c] for c in range(N) if c != r and c != partner]
            logits = np.array([pos] + neg)
            losses.append(-logits[0] + np.log(np.exp(logits).sum()))
    return np.mean(losses)


def test_info_nce_matches_reference_math():
    rng = np.random.default_rng(1)
    e1 = rng.normal(size=(6, 4, 16)).astype(np.float32)
    e2 = rng.normal(size=(6, 4, 16)).astype(np.float32)
    got = float(L.info_nce(jnp.asarray(e1), jnp.asarray(e2), 0.5))
    want = torch_style_info_nce(e1, e2, 0.5)
    assert np.isclose(got, want, rtol=1e-5)


def test_info_nce_alignment_sensitivity():
    """Aligned views must score lower than random views."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=(8, 4, 16)).astype(np.float32)
    aligned = float(L.info_nce(jnp.asarray(base), jnp.asarray(base + 0.01), 0.5))
    random = float(
        L.info_nce(jnp.asarray(base), jnp.asarray(rng.normal(size=base.shape).astype(np.float32)), 0.5)
    )
    assert aligned < random


def test_orthogonality_loss():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    assert float(L.orthogonality_loss(a, b)) == 0.0  # orthogonal -> no penalty
    assert np.isclose(float(L.orthogonality_loss(a, a)), 1.0)  # parallel -> max
    assert float(L.orthogonality_loss(a, -a)) == 0.0  # anti-parallel clamped at 0


def test_temporal_ranking_loss():
    # tight clusters far apart -> intra << inter -> zero loss at margin 1
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 1, 8)) * 100
    emb = jnp.asarray((centers + rng.normal(size=(4, 6, 8)) * 0.01).astype(np.float32))
    assert float(L.temporal_ranking_loss(emb, margin=1.0)) == 0.0
    # all identical -> intra == inter == 0 -> loss == margin
    same = jnp.zeros((4, 6, 8))
    assert np.isclose(float(L.temporal_ranking_loss(same, margin=1.0)), 1.0)


def torch_style_ranking(emb, margin):
    """Numpy replica of loss.py:108-137."""
    n, seq, d = emb.shape
    flat = emb.reshape(n * seq, d)
    dist = np.linalg.norm(flat[:, None] - flat[None, :], axis=-1)
    dist = dist.reshape(n, seq, n, seq).transpose(0, 2, 1, 3)
    mask = (1 - np.eye(n * seq)).reshape(n, seq, n, seq).transpose(0, 2, 1, 3)
    seq_dist = (dist * mask).sum((2, 3)) / mask.sum((2, 3))
    intra = np.repeat(np.diagonal(seq_dist), n - 1)
    inter = seq_dist[~np.eye(n, dtype=bool)].reshape(n, n - 1).flatten()
    return np.mean(np.maximum(intra - inter + margin, 0))


def test_ranking_matches_reference_math():
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(5, 4, 12)).astype(np.float32)
    got = float(L.temporal_ranking_loss(jnp.asarray(emb), margin=1.0))
    want = torch_style_ranking(emb, 1.0)
    assert np.isclose(got, want, rtol=1e-4)


def test_focal_loss_noprivate_ablation(make_args):
    """-tag noPrivate switches the shared InfoNCE to full (unsplit) features
    (reference: loss.py:163-170)."""
    base = make_args(
        argv=["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "pretrain"]
    )
    ablated = make_args(
        argv=["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL",
              "-stage", "pretrain", "-tag", "noPrivate"]
    )
    rng = np.random.default_rng(7)
    f1 = {m: jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32)) for m in ["seismic", "audio"]}
    f2 = {m: jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32)) for m in ["seismic", "audio"]}
    _, parts_base = L.make_focal_loss(base)(f1, f2)
    _, parts_abl = L.make_focal_loss(ablated)(f1, f2)
    # shared term differs (full vs split features); private term is unchanged
    assert not np.isclose(float(parts_base["shared"]), float(parts_abl["shared"]))
    assert np.isclose(float(parts_base["private"]), float(parts_abl["private"]))


def test_focal_loss_composition(make_args):
    args = make_args(
        argv=["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "pretrain"]
    )
    loss_fn = L.make_focal_loss(args)
    rng = np.random.default_rng(5)
    B, dim = 16, 32  # 4 subsequences x seq_len 4
    f1 = {m: jnp.asarray(rng.normal(size=(B, dim)).astype(np.float32)) for m in ["seismic", "audio"]}
    f2 = {m: jnp.asarray(rng.normal(size=(B, dim)).astype(np.float32)) for m in ["seismic", "audio"]}
    total, parts = jax.jit(loss_fn)(f1, f2)
    assert np.isfinite(float(total))
    recon = parts["shared"] + parts["private"] + 3 * parts["orthogonality"] + 5 * parts["ranking"]
    assert np.isclose(float(total), float(recon), rtol=1e-5)
    # gradient flows
    g = jax.grad(lambda a: loss_fn(a, f2)[0])(f1)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
