"""Stochastic depth (per-sample residual-branch drop).

Reference: nets/drop.py:11-40 (timm-style DropPath): during training each
sample's residual branch is zeroed with probability ``p`` and survivors are
rescaled by ``1 / (1 - p)``.  Randomness comes from an explicit JAX PRNG key
instead of global RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_path(x: jnp.ndarray, rate: float, rng: jax.Array,
              deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape=shape)
    return jnp.where(keep, x / keep_prob, jnp.zeros_like(x))
