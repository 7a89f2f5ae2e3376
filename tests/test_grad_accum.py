"""Gradient accumulation (-grad_accum): optax.MultiSteps wrapping in
build_optimizer.

The property that matters: k micro-batch updates with grad_accum=k equal ONE
full-batch update with grad_accum=1 (mean loss over equal-size micro-batches
=> averaged grads == full-batch grads). Exact for LayerNorm models
(SW_Transformer); BatchNorm batch statistics stay per-micro-batch by design
(documented in the flag help). The reference has no accumulation support
(src/train_utils/supervised_train.py:65-79 steps the optimizer every batch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from focal_tpu.models import build_backbone
from focal_tpu.ops import build_augmenter
from focal_tpu.train.losses import cross_entropy
from focal_tpu.train.optim import build_optimizer
from focal_tpu.train.state import init_state


@pytest.fixture(scope="module")
def sw_setup(tmp_path_factory):
    from focal_tpu.params.cli import build_parser
    from focal_tpu.params.auto import set_auto_params

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "SW_Transformer", "-learn_framework", "no",
         "-synthetic", "-batch_size", "8", "-compute_dtype", "float32"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path_factory.mktemp("ga"))
    args = set_auto_params(args)
    # dropout off so half-batch forwards are deterministic given the rng
    sw = args.dataset_config["SW_Transformer"]
    sw["dropout_ratio"] = 0.0
    sw["drop_path_rate"] = 0.0
    sw["attn_drop_rate"] = 0.0

    model = build_backbone(args)
    augmenter = build_augmenter(args)
    rng = np.random.default_rng(0)
    batch = {
        "shake": {
            "seismic": jnp.asarray(rng.normal(size=(8, 1, 10, 20)).astype(np.float32)),
            "audio": jnp.asarray(rng.normal(size=(8, 1, 10, 96)).astype(np.float32)),
        }
    }
    freq_x = jax.jit(augmenter.no)(batch)
    n_classes = args.dataset_config[args.task]["num_classes"]
    labels = jnp.asarray(rng.integers(0, n_classes, size=(8,)), jnp.int32)
    state = init_state(args, model, freq_x, optax.identity(), jax.random.key(0))

    # jitted (one compile per slice shape, persisted in the test cache) — the
    # unjitted op-by-op grad of even the TINY transformer dominated the test's
    # wall time on this 1-core host
    @jax.jit
    def _grads(params, fx, y):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                fx, train=False, head="class",
            )
            return cross_entropy(out, y)

        return jax.grad(loss_fn)(params)

    def grads_of(params, sl):
        fx = jax.tree_util.tree_map(lambda a: a[sl], freq_x)
        return _grads(params, fx, labels[sl])

    return args, state.params, grads_of


def test_accum_k_micro_updates_match_full_batch(sw_setup):
    """Two properties, separated so neither is masked by Adam's step-1
    conditioning (update ~ g/(|g|+eps): for near-cancelling gradient
    elements, reduction-order fp noise flips it — same reason
    test_parallel.py uses SGD for its parity check):

    1. model: mean-CE over equal halves averages to the full-batch gradient;
    2. optimizer: MultiSteps applies the inner chain exactly once to the
       averaged gradient (identical inputs -> near-bit-equal params)."""
    args, params, grads_of = sw_setup

    g_full = grads_of(params, slice(None))
    g_a = grads_of(params, slice(0, 4))
    g_b = grads_of(params, slice(4, 8))
    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g_a, g_b)

    for gf, gm in zip(jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_mean)):
        scale = max(float(jnp.max(jnp.abs(gf))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gm), rtol=0, atol=3e-6 * scale
        )

    args.grad_accum = 1
    tx_full, _ = build_optimizer(args, params, steps_per_epoch=2, epochs_override=4)
    opt = tx_full.init(params)
    upd, _ = tx_full.update(g_mean, opt, params)
    p_full = optax.apply_updates(params, upd)

    args.grad_accum = 2
    tx_acc, _ = build_optimizer(args, params, steps_per_epoch=2, epochs_override=4)
    opt = tx_acc.init(params)
    upd1, opt = tx_acc.update(g_a, opt, params)
    # non-final micro-step: zero update, params untouched
    assert all(
        float(jnp.max(jnp.abs(u))) == 0.0 for u in jax.tree_util.tree_leaves(upd1)
    )
    p_mid = optax.apply_updates(params, upd1)
    upd2, opt = tx_acc.update(g_b, opt, p_mid)
    p_acc = optax.apply_updates(p_mid, upd2)

    flat_full = jax.tree_util.tree_leaves(p_full)
    flat_acc = jax.tree_util.tree_leaves(p_acc)
    for a, b in zip(flat_full, flat_acc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)


def test_accum_schedule_advances_per_effective_update(sw_setup):
    """With grad_accum=k the inner schedule count advances once per k micro
    steps; eff_steps_per_epoch = steps_per_epoch/k keeps the epoch->lr map
    identical to the unaccumulated run."""
    args, _, _ = sw_setup
    # tiny stand-in tree: this test only counts effective updates, the model
    # params' values are irrelevant and a full tree makes 12 unjitted optax
    # updates expensive
    params = {"mod_in": {"kernel": jnp.ones((4, 4))}}
    args.grad_accum = 3
    tx, _ = build_optimizer(args, params, steps_per_epoch=4, epochs_override=4)
    opt = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    for _ in range(3 * 4):
        _, opt = tx.update(zeros, opt, params)
    assert int(opt.gradient_step) == 4
    assert int(opt.mini_step) == 0


def test_accum_composes_with_finetune_freeze_mask():
    """MultiSteps wraps OUTSIDE the multi_transform freeze mask: frozen
    leaves stay bit-identical across a full accumulation cycle, trainable
    leaves update on the k-th micro-step only."""
    import types

    from focal_tpu.train.optim import trainable_mask

    args = types.SimpleNamespace(
        stage="finetune", train_mode="contrastive", model="DeepSense",
        learn_framework="FOCAL", clip_grad=False, grad_accum=2,
        dataset_config={
            "FOCAL": {
                "finetune_optimizer": {"name": "AdamW", "start_lr": 1e-3, "weight_decay": 0.05},
                "finetune_lr_scheduler": {"name": "cosine", "train_epochs": 4},
            }
        },
    )
    params = {
        "class_layer": {"kernel": jnp.ones((3, 3))},
        "backbone": {"kernel": jnp.ones((3, 3))},
    }
    mask = trainable_mask(params, args)
    assert mask["class_layer"]["kernel"] and not mask["backbone"]["kernel"]

    tx, _ = build_optimizer(args, params, steps_per_epoch=2, epochs_override=4)
    opt = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd1, opt = tx.update(g, opt, params)
    p1 = optax.apply_updates(params, upd1)
    upd2, opt = tx.update(g, opt, p1)
    p2 = optax.apply_updates(p1, upd2)
    np.testing.assert_array_equal(np.asarray(p1["class_layer"]["kernel"]), 1.0)  # mid-cycle: no update
    np.testing.assert_array_equal(np.asarray(p2["backbone"]["kernel"]), 1.0)  # frozen stays frozen
    assert float(jnp.max(jnp.abs(p2["class_layer"]["kernel"] - 1.0))) > 0  # trainable moved


@pytest.mark.slow
def test_supervised_loop_with_grad_accum_learns(make_args):
    """End-to-end: the epoch-scan loop trains under accumulation (MultiSteps
    state threads through lax.scan + donation) and still learns the separable
    synthetic classes."""
    from focal_tpu.train.loops import supervised_train

    args = make_args(
        argv=["-dataset", "MOD_TINY", "-synthetic", "-synthetic_samples", "96",
              "-batch_size", "16", "-seed", "3", "-data_parallel", "1",
              "-model", "DeepSense", "-learn_framework", "no",
              "-grad_accum", "2", "-epochs", "12", "-val_epochs", "4"],
    )
    state, best_val_acc = supervised_train(args)
    assert best_val_acc > 0.6


# ---------------------------------------------------------------------------
# FOCAL pretrain gathered accumulation (GradCache two-pass): with
# -grad_accum k the epoch fn computes the FOCAL loss ONCE on the features of
# all k micro-batches concatenated, so contrastive negatives span the full
# effective batch, then recovers the EXACT large-batch parameter gradient by
# recomputing each micro-forward under jax.vjp (steps.make_pretrain_epoch_fn).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def accum_setup(tmp_path_factory):
    from focal_tpu.params.cli import build_parser
    from focal_tpu.params.auto import set_auto_params

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "SW_Transformer", "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-batch_size", "8", "-compute_dtype", "float32"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path_factory.mktemp("gacc"))
    args = set_auto_params(args)

    from focal_tpu.train.losses import make_focal_loss

    model = build_backbone(args)
    augmenter = build_augmenter(args)
    focal_loss = make_focal_loss(args)
    seq_len = args.dataset_config["seq_len"]  # 4
    n_samples = 16  # 4 subsequences
    rng = np.random.default_rng(0)
    data = {
        "shake": {
            "seismic": jnp.asarray(rng.normal(size=(n_samples, 1, 10, 20)).astype(np.float32)),
            "audio": jnp.asarray(rng.normal(size=(n_samples, 1, 10, 96)).astype(np.float32)),
        }
    }
    subseq_idx = np.arange(n_samples).reshape(-1, seq_len)
    sample = jax.jit(augmenter.no)(jax.tree_util.tree_map(lambda a: a[:2], data))
    state = init_state(args, model, sample, optax.sgd(0.05), jax.random.key(0))
    return args, model, augmenter, focal_loss, data, subseq_idx, state


def test_gathered_accum_is_exact_large_batch_gradient(accum_setup):
    """grad_accum=2, batch_size=8, 4 subsequences -> ONE effective step per
    epoch over both micro-batches. The expected update is direct autodiff of
    the concatenated-features FOCAL loss through BOTH micro-forwards in one
    graph (the true effective-batch gradient, dropout keys matched); the
    epoch fn must reproduce it through its two-pass feature-gather."""
    from focal_tpu.train.steps import make_pretrain_epoch_fn

    args, model, augmenter, focal_loss, data, subseq_idx, state0 = accum_setup
    k = 2
    seq_len = subseq_idx.shape[1]
    per = 8 // seq_len  # 2 subsequences per micro-batch
    n_items = subseq_idx.shape[0]
    rng = jax.random.key(11)

    fn = make_pretrain_epoch_fn(
        model, augmenter, focal_loss,
        n_items=n_items, batch_size=8, subseq_idx=subseq_idx,
        mesh_plan=None, fused_views=True, grad_accum=k, accum_gather=True,
    )
    assert fn.steps_per_epoch == 1  # 2 micro-steps -> 1 effective update
    assert fn.windows_per_epoch == 16
    state_acc, loss_acc = fn(jax.tree_util.tree_map(jnp.copy, state0), data, rng)

    # ---- direct large-batch reference, mirroring the epoch fn's rng folding
    rows = jnp.asarray(subseq_idx)
    epoch = 0
    perm_rng, step_rng = jax.random.split(jax.random.fold_in(rng, epoch))
    perm = jax.random.permutation(perm_rng, n_items)

    def direct_loss(params):
        fs1, fs2 = [], []
        stats = state0.batch_stats
        for j in range(k):
            sel = jax.lax.dynamic_slice(perm, (j * per,), (per,))
            idx = jnp.take(rows, sel, axis=0).reshape(-1)
            batch = jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), data)
            rv1, rv2, rdrop = jax.random.split(jax.random.fold_in(step_rng, j), 3)
            v1 = augmenter.random(rv1, batch)
            v2 = augmenter.random(rv2, batch)
            both = jax.tree_util.tree_map(lambda a, c: jnp.concatenate([a, c], axis=0), v1, v2)
            feats, mut = model.apply(
                {"params": params, "batch_stats": stats}, both, train=True,
                head="proj", rngs={"dropout": rdrop}, mutable=["batch_stats"],
            )
            stats = mut["batch_stats"]
            b = per * seq_len
            fs1.append({m: v[:b] for m, v in feats.items()})
            fs2.append({m: v[b:] for m, v in feats.items()})
        F1 = {m: jnp.concatenate([f[m] for f in fs1], axis=0) for m in fs1[0]}
        F2 = {m: jnp.concatenate([f[m] for f in fs2], axis=0) for m in fs2[0]}
        loss, _ = focal_loss(F1, F2)
        return loss

    loss_direct, grads = jax.value_and_grad(jax.jit(direct_loss))(state0.params)
    np.testing.assert_allclose(float(loss_acc), float(loss_direct), rtol=2e-5)

    expected = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g, state0.params, grads)
    for e, a in zip(jax.tree_util.tree_leaves(expected), jax.tree_util.tree_leaves(state_acc.params)):
        scale = max(float(jnp.max(jnp.abs(e))), 1e-12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=0, atol=5e-6 * scale)


def test_gathered_accum_negatives_span_effective_batch(accum_setup):
    """The gathered loss differs from the mean of per-micro losses (negatives
    crossed micro-batches), proving the gather isn't reducing to MultiSteps."""
    from focal_tpu.train.steps import make_pretrain_epoch_fn

    args, model, augmenter, focal_loss, data, subseq_idx, state0 = accum_setup
    rng = jax.random.key(11)
    gathered = make_pretrain_epoch_fn(
        model, augmenter, focal_loss,
        n_items=subseq_idx.shape[0], batch_size=8, subseq_idx=subseq_idx,
        mesh_plan=None, grad_accum=2, accum_gather=True,
    )
    micro = make_pretrain_epoch_fn(
        model, augmenter, focal_loss,
        n_items=subseq_idx.shape[0], batch_size=8, subseq_idx=subseq_idx,
        mesh_plan=None, grad_accum=2, accum_gather=False,
    )
    _, loss_g = gathered(jax.tree_util.tree_map(jnp.copy, state0), data, rng)
    _, loss_m = micro(jax.tree_util.tree_map(jnp.copy, state0), data, rng)
    assert not np.isclose(float(loss_g), float(loss_m), rtol=1e-3)


def test_gathered_accum_rejects_oversized_accum(accum_setup):
    from focal_tpu.train.steps import make_pretrain_epoch_fn

    args, model, augmenter, focal_loss, data, subseq_idx, state0 = accum_setup
    with pytest.raises(ValueError, match="grad_accum"):
        make_pretrain_epoch_fn(
            model, augmenter, focal_loss,
            n_items=subseq_idx.shape[0], batch_size=8, subseq_idx=subseq_idx,
            mesh_plan=None, grad_accum=5, accum_gather=True,
        )
