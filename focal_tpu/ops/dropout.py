"""Residual-free dropout.

XLA's autodiff saves the dropout keep-mask as a backward residual; on big
activations (the Swin MLP hidden is [rows, 4C]) that is serious HBM traffic.
``remat_dropout`` keeps only the PRNG *key* as the residual and regenerates
the mask in the backward — exact same values and gradients as the standard
formulation (the mask is a pure function of the key), works on any backend.
"""

import functools

import jax
import jax.numpy as jnp


def _keep(key, rate, shape):
    return jax.random.bernoulli(key, 1.0 - rate, shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def remat_dropout(x, key, rate):
    """Inverted dropout: zero with probability ``rate``, scale by 1/keep.

    rate must be a static float in (0, 1); callers gate rate==0 / eval mode
    themselves (use identity there).
    """
    return jnp.where(_keep(key, rate, x.shape), x / (1.0 - rate), 0.0).astype(x.dtype)


def _fwd(x, key, rate):
    return remat_dropout(x, key, rate), key


def _bwd(rate, key, g):
    dx = jnp.where(_keep(key, rate, g.shape), g / (1.0 - rate), 0.0).astype(g.dtype)
    return dx, None


remat_dropout.defvjp(_fwd, _bwd)
