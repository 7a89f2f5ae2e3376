"""Time -> frequency preprocessing.

Bit-layout parity with the reference's on-device FFT
(reference: src/data_augmenter/Augmenter.py:141-158): full complex FFT over
the last (sample) axis, real/imag interleaved along the channel axis, so
``[b, c, i, s] -> [b, 2c, i, s]`` with channel order
``[c0_re, c0_im, c1_re, c1_im, ...]``.

Runs inside jit on device as part of the fused augmentation pipeline; XLA
lowers the FFT to the TPU's native implementation. Computed in float32
regardless of the surrounding compute dtype (FFT precision budget is 1e-5).
"""

import jax.numpy as jnp


def fft_mod(x):
    """FFT one modality array [b, c, i, s] -> [b, 2c, i, s] (interleaved).

    The input is real, so the full spectrum is computed as an rfft plus its
    conjugate mirror (X[k] = conj(X[s-k])) — identical values at half the
    FFT work. Falls back to the complex FFT for odd lengths.
    """
    b, c, i, s = x.shape
    xf = x.astype(jnp.float32)
    if s % 2 == 0:
        half = jnp.fft.rfft(xf, axis=-1)  # [b, c, i, s//2 + 1]
        re, im = half.real, half.imag
        re_full = jnp.concatenate([re, re[..., -2:0:-1]], axis=-1)
        im_full = jnp.concatenate([im, -im[..., -2:0:-1]], axis=-1)
        out = jnp.stack([re_full, im_full], axis=2)  # [b, c, 2, i, s]
    else:
        freq = jnp.fft.fft(xf, axis=-1)
        out = jnp.stack([freq.real, freq.imag], axis=2)
    return out.reshape(b, 2 * c, i, s)


def fft_preprocess(time_loc_inputs):
    """Apply fft_mod across a {loc: {mod: array}} pytree."""
    return {
        loc: {mod: fft_mod(x) for mod, x in mods.items()}
        for loc, mods in time_loc_inputs.items()
    }


def ifft_mod(x):
    """Inverse of fft_mod (used in tests and signal tooling)."""
    b, c2, i, s = x.shape
    c = c2 // 2
    z = x.reshape(b, c, 2, i, s)
    comp = z[:, :, 0] + 1j * z[:, :, 1]
    return jnp.fft.ifft(comp, axis=-1).real
