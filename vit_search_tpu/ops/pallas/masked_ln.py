"""Pallas TPU kernel: masked layer norm forward.

Fuses the whole masked-LN forward — mask-fraction correction, moments,
normalization, affine, re-mask — into one VMEM pass per row tile
(the fusion target named for the rebuild; reference numerics in
ops/masked_layer_norm.py).  The custom VJP saves ``(z, inv_std, inv_p,
mask)`` and computes the backward with the analytic formulas in plain JAX
(the same residual strategy as the reference autograd function,
nets/masked_layer_norm.py:48).

Constraints: feature dim ``C`` must be a multiple of 128 (TPU lane width)
and the row tile a multiple of 8; callers fall back to the plain-JAX path
otherwise (ops.masked_layer_norm).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_ROW_TILE = 128


def _kernel(x_ref, mask_ref, w_ref, b_ref, y_ref, z_ref, stats_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)              # (rows, C)
    mask = mask_ref[0].astype(jnp.float32)        # (1, C)
    w = w_ref[...].astype(jnp.float32)            # (C,)
    b = b_ref[...].astype(jnp.float32)

    inv_p = 1.0 / jnp.mean(mask, axis=-1, keepdims=True)      # (1, 1)
    mu = jnp.mean(x, axis=-1, keepdims=True) * inv_p          # (rows, 1)
    x2 = jnp.mean(x * x, axis=-1, keepdims=True) * inv_p
    var = x2 - mu * mu
    inv_std = jax.lax.rsqrt(var + eps)
    z = (x - mu) * inv_std
    y = (w[None, :] * z + b[None, :]) * mask

    y_ref[0] = y.astype(y_ref.dtype)
    z_ref[0] = z.astype(z_ref.dtype)
    stats_ref[0, :, 0] = inv_std[:, 0]
    stats_ref[0, :, 1] = jnp.broadcast_to(inv_p, inv_std.shape)[:, 0]


def _forward(x: Array, mask: Array, weight: Array, bias: Array,
             eps: float) -> Tuple[Array, Array, Array]:
    b, n, c = x.shape
    rows = min(_ROW_TILE, n) if n % min(_ROW_TILE, n) == 0 else n
    grid = (b, n // rows)

    y, z, stats = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, n, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 2), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, mask.astype(x.dtype), weight.astype(jnp.float32),
      bias.astype(jnp.float32))
    return y, z, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_layer_norm_pallas(x: Array, weight: Array, bias: Array,
                             mask: Array, eps: float = 1e-6) -> Array:
    y, _, _ = _forward(x, mask, weight, bias, eps)
    return y


def _bwd_full(eps, residuals, g):
    z, stats, mask, weight = residuals
    x_dtype = g.dtype  # cotangent dtype == output dtype == input dtype
    inv_std = stats[..., 0:1]
    inv_p = stats[..., 1:2]
    maskf = mask.astype(jnp.float32)
    gf = g.astype(jnp.float32) * maskf

    g_weight = jnp.sum(gf * z, axis=tuple(range(z.ndim - 1)))
    g_bias = jnp.sum(gf, axis=tuple(range(z.ndim - 1)))

    dz = gf * weight.astype(jnp.float32)
    mean_dz = jnp.mean(dz, axis=-1, keepdims=True)
    mean_zdz = jnp.mean(z * dz, axis=-1, keepdims=True)
    gx = (-(mean_dz + z * mean_zdz) * inv_p + dz) * inv_std
    return (gx.astype(x_dtype), g_weight.astype(jnp.float32),
            g_bias.astype(jnp.float32), jnp.zeros_like(maskf))


def _fwd_full(x, weight, bias, mask, eps):
    y, z, stats = _forward(x, mask, weight, bias, eps)
    return y, (z, stats, mask, weight)


masked_layer_norm_pallas.defvjp(_fwd_full, _bwd_full)


def supported(x: Array, mask: Optional[Array]) -> bool:
    """Whether the Pallas kernel can handle this shape."""
    if mask is None or x.ndim != 3:
        return False
    b, n, c = x.shape
    return c % 128 == 0 and (n % 8 == 0)
