"""Residual-free dropout.

XLA's autodiff saves the dropout keep-mask as a backward residual; on big
activations (the Swin MLP hidden is [rows, 4C]) that is serious HBM traffic.
``remat_dropout`` keeps only the PRNG *key* as the residual and regenerates
the mask in the backward — exact same values and gradients as the standard
formulation (the mask is a pure function of the key), works on any backend.

The mask is an 8-bit threshold compare, not ``jax.random.bernoulli``: the
TPU's rng-bit-generator emits u8 natively, so generating the mask moves 4x
fewer random bytes and the compare reads 1 byte/element instead of 4
(measured 1.68 -> 0.76 ms per mask+apply at the Swin stage-0 MLP hidden
[512, 576, 256], and the mask is regenerated in the backward, doubling the
win). The drop probability quantizes to t/256 with t = round(rate * 256) —
at most 1/512 from the nominal rate — and the inverted-dropout scale uses
the REALIZED keep probability (256-t)/256, so E[output] == input exactly.
"""

import functools

import jax
import jax.numpy as jnp


def _threshold(rate):
    """Quantized u8 drop threshold: drop iff bits < t, P(drop) = t/256."""
    return max(1, min(255, round(rate * 256.0)))


def _keep(key, rate, shape):
    return jax.random.bits(key, shape, jnp.uint8) >= _threshold(rate)


def _inv_keep(rate):
    return 256.0 / (256 - _threshold(rate))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def remat_dropout(x, key, rate):
    """Inverted dropout: zero with probability ``rate`` (quantized to
    1/256ths), scale survivors by 1/keep.

    rate must be a static float in (0, 1); callers gate rate==0 / eval mode
    themselves (use identity there).
    """
    return jnp.where(_keep(key, rate, x.shape), x * _inv_keep(rate), 0.0).astype(x.dtype)


def _fwd(x, key, rate):
    return remat_dropout(x, key, rate), key


def _bwd(rate, key, g):
    dx = jnp.where(_keep(key, rate, g.shape), g * _inv_keep(rate), 0.0).astype(g.dtype)
    return dx, None


remat_dropout.defvjp(_fwd, _bwd)
