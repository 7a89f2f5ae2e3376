"""Mechanics of the round-5 attribution arms: -py_aug_draws (host-drawn
augmenter selection) and -ragged_tail (the reference BatchSeqSampler's final
partial batch, multi_modal_dataloader.py:66-77).

These arms exist to explain the focal-vs-reference quality gap (PARITY.md
"quality-gap attribution"); the tests pin their semantics, not their effect.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from focal_tpu.models import build_backbone
from focal_tpu.ops import build_augmenter
from focal_tpu.train.losses import make_focal_loss
from focal_tpu.train.state import init_state


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.params.cli import build_parser

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-batch_size", "8",
         "-compute_dtype", "float32"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path_factory.mktemp("attr_arms"))
    args = set_auto_params(args)

    model = build_backbone(args)
    augmenter = build_augmenter(args)
    focal_loss = make_focal_loss(args)
    seq_len = args.dataset_config["seq_len"]  # 4
    n_samples = 20  # 5 subsequences: per=2 -> 2 full steps + 1-subseq tail
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


def test_force_aug_id_matches_on_device_draw(setup):
    """random(key, x, force_aug_id=i) with i = the id the key itself would
    draw must be BIT-IDENTICAL to random(key, x): forcing only replaces the
    selection, nothing downstream."""
    args, model, augmenter, focal_loss, data, subseq_idx, state = setup
    batch = jax.tree_util.tree_map(lambda a: a[:4], data)
    n = len(augmenter.time_aug_names) + len(augmenter.freq_aug_names)
    for s in range(4):
        key = jax.random.key(100 + s)
        k_sel, _ = jax.random.split(key)
        drawn = int(jax.random.randint(k_sel, (), 0, n))
        out_free = jax.jit(augmenter.random)(key, batch)
        out_forced = jax.jit(lambda k, b, i: augmenter.random(k, b, force_aug_id=i))(
            key, batch, jnp.int32(drawn)
        )
        for m in out_free["shake"]:
            np.testing.assert_array_equal(
                np.asarray(out_free["shake"][m]), np.asarray(out_forced["shake"][m])
            )


def test_forced_ids_select_distinct_augmenters(setup):
    """Different forced ids must produce different outputs for at least the
    deterministic augmenters (the switch actually routes by the id)."""
    args, model, augmenter, focal_loss, data, subseq_idx, state = setup
    batch = jax.tree_util.tree_map(lambda a: a[:4], data)
    key = jax.random.key(3)
    n = len(augmenter.time_aug_names) + len(augmenter.freq_aug_names)
    outs = [
        np.asarray(
            jax.jit(lambda k, b, i: augmenter.random(k, b, force_aug_id=i))(
                key, batch, jnp.int32(i)
            )["shake"]["audio"]
        )
        for i in range(n)
    ]
    distinct = {outs[i].tobytes() for i in range(n)}
    assert len(distinct) >= 3  # the pool is not collapsing to one branch


def test_aug_id_table_is_deterministic_and_applied(setup):
    """An epoch fn with a constant-id table is reproducible, and tables
    forcing different augmenters produce different updates."""
    from focal_tpu.train.steps import make_pretrain_epoch_fn

    args, model, augmenter, focal_loss, data, subseq_idx, state0 = setup
    n_items = subseq_idx.shape[0]
    rng = jax.random.key(7)

    def run(table):
        fn = make_pretrain_epoch_fn(
            model, augmenter, focal_loss, n_items=n_items, batch_size=8,
            subseq_idx=subseq_idx, aug_id_table=table,
        )
        st, loss = fn(jax.tree_util.tree_map(jnp.copy, state0), data, rng)
        return st, float(loss)

    table0 = np.zeros((4, 2, 2), np.int32)
    table1 = np.ones((4, 2, 2), np.int32)
    st_a, loss_a = run(table0)
    st_b, loss_b = run(table0)
    st_c, loss_c = run(table1)
    assert loss_a == loss_b
    la = jax.tree_util.tree_leaves(st_a.params)
    for a, b in zip(la, jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(c))
        for a, c in zip(la, jax.tree_util.tree_leaves(st_c.params))
    )


def test_ragged_tail_adds_one_update_per_epoch(setup):
    """5 subsequences at per=3 (batch 12): default runs 1 update/epoch (tail
    dropped); -ragged_tail runs 2 — the 2-subsequence tail update moves the
    params. A 1-subsequence tail (per=2) is dropped even under the flag:
    the temporal ranking loss is degenerate there (NaN in the reference's
    own math too)."""
    from focal_tpu.train.steps import make_pretrain_epoch_fn

    args, model, augmenter, focal_loss, data, subseq_idx, state0 = setup
    n_items = subseq_idx.shape[0]
    rng = jax.random.key(7)
    kw = dict(n_items=n_items, batch_size=12, subseq_idx=subseq_idx)

    fn_drop = make_pretrain_epoch_fn(model, augmenter, focal_loss, **kw)
    fn_tail = make_pretrain_epoch_fn(model, augmenter, focal_loss, ragged_tail=True, **kw)
    assert fn_drop.windows_per_epoch == 1 * 3 * 4  # 1 step x 3 subseq x seq 4
    assert fn_tail.windows_per_epoch == 1 * 3 * 4 + 2 * 4  # + 2-subseq tail

    st_d, _ = fn_drop(jax.tree_util.tree_map(jnp.copy, state0), data, rng)
    st_t, loss_t = fn_tail(jax.tree_util.tree_map(jnp.copy, state0), data, rng)
    assert int(st_d.step) == 1
    assert int(st_t.step) == 2
    assert np.isfinite(float(loss_t))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(st_d.params), jax.tree_util.tree_leaves(st_t.params)
        )
    )
    # second epoch: the step-derived epoch index must advance by exactly one
    # (state.step // updates_per_epoch), keeping shuffles epoch-distinct
    st_t2, _ = fn_tail(st_t, data, rng)
    assert int(st_t2.step) == 4

    # the degenerate 1-subsequence tail (per=2 -> 5 % 2 = 1) stays dropped
    fn_one = make_pretrain_epoch_fn(model, augmenter, focal_loss, ragged_tail=True,
                                    n_items=n_items, batch_size=8,
                                    subseq_idx=subseq_idx)
    assert fn_one.windows_per_epoch == 2 * 2 * 4  # tail NOT counted


def test_ragged_tail_lr_paces_by_true_epochs(tmp_path, monkeypatch):
    """The tail step adds one optimizer update per epoch; the epoch-granular
    schedule must divide by updates-per-epoch INCLUDING the tail (the
    reference steps its scheduler once per epoch regardless of the sampler's
    batch count) — otherwise the arm trains on a compressed schedule and the
    attribution is confounded."""
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.params.cli import build_parser
    from focal_tpu.train import loops

    captured = {}
    real = loops.build_optimizer

    def spy(args, params, steps_per_epoch, **kw):
        captured["spe"] = steps_per_epoch
        return real(args, params, steps_per_epoch, **kw)

    monkeypatch.setattr(loops, "build_optimizer", spy)
    # 32 samples = 8 subsequences at seq 4; batch 12 -> per=3 -> 2 full
    # steps + a 2-subsequence tail (tails of ONE subsequence are dropped:
    # degenerate ranking loss, see steps.make_pretrain_epoch_fn)
    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-synthetic_samples", "32",
         "-batch_size", "12", "-epochs", "1", "-val_epochs", "1",
         "-compute_dtype", "float32", "-ragged_tail"]
    )
    args.option = "train"
    args.output_dir = str(tmp_path)
    args = set_auto_params(args)
    state, _ = loops.pretrain(args)
    assert captured["spe"] == 3  # 2 full steps + the tail update
    assert int(state.step) == 3


def test_arm_flags_rejected_outside_replicated_single_step(setup):
    """loops.pretrain refuses the arms under grad_accum (and the narrow-arm
    guard message names the flags)."""
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.params.cli import build_parser
    from focal_tpu.train.loops import pretrain

    args = build_parser().parse_args(
        ["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "FOCAL",
         "-stage", "pretrain", "-synthetic", "-batch_size", "8", "-epochs", "1",
         "-compute_dtype", "float32", "-py_aug_draws", "-grad_accum", "2"]
    )
    args.option = "train"
    import tempfile

    args.output_dir = tempfile.mkdtemp()
    args = set_auto_params(args)
    with pytest.raises(ValueError, match="attribution arms"):
        pretrain(args)
