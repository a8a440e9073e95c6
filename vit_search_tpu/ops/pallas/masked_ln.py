"""Pallas TPU kernels: masked layer norm, fused forward AND backward.

Forward fuses the whole masked-LN — mask-fraction correction, moments,
normalization, affine, re-mask — into one VMEM pass per example
(reference numerics in ops/masked_layer_norm.py).  Only the per-token
``(mu, inv_std)`` statistics are saved for the backward (plus ``x``, which
JAX already keeps alive as the primal input — no extra HBM write), unlike
the XLA lowering, which runs separate stat-reduction kernels and re-reads
``x`` for the normalize pass.

Backward is a second kernel producing ``gx`` in one pass and accumulating
the affine-parameter gradients across the sequential grid in a revisited
``(1, C)`` output block — replacing the constellation of small XLA
reduce-fusions (profiled at ~10 ms/step across the supernet's 39 masked
LNs at batch 512).

Constraints: feature dim ``C`` must be a multiple of 128 (TPU lane width);
the row (sequence) length is unconstrained — blocks cover one example's
whole sequence, and Mosaic pads the sublane dim internally (ViT-SR stage
lengths 257/65/17 are all odd).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_ref, mask_ref, w_ref, b_ref, y_ref, stats_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)            # (g, n, C)
    mask = mask_ref[...].astype(jnp.float32)      # (g, 1, C)
    w = w_ref[...].astype(jnp.float32)            # (C,)
    b = b_ref[...].astype(jnp.float32)

    inv_p = 1.0 / jnp.mean(mask, axis=-1, keepdims=True)      # (g, 1, 1)
    mu = jnp.mean(x, axis=-1, keepdims=True) * inv_p          # (g, n, 1)
    x2 = jnp.mean(x * x, axis=-1, keepdims=True) * inv_p
    var = x2 - mu * mu
    inv_std = jax.lax.rsqrt(var + eps)
    y = (w[None, None, :] * ((x - mu) * inv_std) + b[None, None, :]) * mask

    y_ref[...] = y.astype(y_ref.dtype)
    stats_ref[:, :, 0] = mu[:, :, 0]
    stats_ref[:, :, 1] = inv_std[:, :, 0]


def _bwd_kernel(x_ref, mask_ref, w_ref, stats_ref, g_ref,
                gx_ref, gw_ref, gb_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)            # (g, n, C)
    mask = mask_ref[...].astype(jnp.float32)      # (g, 1, C)
    w = w_ref[...].astype(jnp.float32)            # (C,)
    mu = stats_ref[:, :, 0][:, :, None]           # (g, n, 1)
    inv_std = stats_ref[:, :, 1][:, :, None]
    inv_p = 1.0 / jnp.mean(mask, axis=-1, keepdims=True)

    z = (x - mu) * inv_std
    gf = g_ref[...].astype(jnp.float32) * mask
    dz = gf * w[None, None, :]
    mean_dz = jnp.mean(dz, axis=-1, keepdims=True)
    mean_zdz = jnp.mean(z * dz, axis=-1, keepdims=True)
    gx = (dz - (mean_dz + z * mean_zdz) * inv_p) * inv_std
    gx_ref[...] = gx.astype(gx_ref.dtype)

    @pl.when(i == 0)
    def _():
        gw_ref[...] = jnp.zeros_like(gw_ref)
        gb_ref[...] = jnp.zeros_like(gb_ref)

    gw_ref[...] += jnp.sum(gf * z, axis=(0, 1), keepdims=False)[None]
    gb_ref[...] += jnp.sum(gf, axis=(0, 1), keepdims=False)[None]


def _pick_group(b: int, n: int, c: int) -> int:
    """Examples per grid cell: ~4 f32 (n, c) temporaries live per example,
    double-buffered blocks; target <= ~6 MB of VMEM."""
    budget = 6 * 1024 * 1024
    per_ex = 4 * n * c * 4
    g = max(1, min(b, budget // per_ex, 32))
    while b % g:
        g -= 1
    return g


def _row_spec(g: int, n: int, c: int):
    return pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(g: int, c: int):
    return pl.BlockSpec((g, 1, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _forward(x: Array, mask: Array, weight: Array, bias: Array,
             eps: float) -> Tuple[Array, Array]:
    b, n, c = x.shape
    g = _pick_group(b, n, c)
    y, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(b // g,),
        in_specs=[
            _row_spec(g, n, c),
            _mask_spec(g, c),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            _row_spec(g, n, c),
            pl.BlockSpec((g, n, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, n, 2), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, mask.astype(x.dtype), weight.astype(jnp.float32),
      bias.astype(jnp.float32))
    return y, stats


def _backward(x: Array, mask: Array, weight: Array, stats: Array,
              g: Array) -> Tuple[Array, Array, Array]:
    b, n, c = x.shape
    grp = _pick_group(b, n, c)
    gx, gw, gb = pl.pallas_call(
        _bwd_kernel,
        grid=(b // grp,),
        in_specs=[
            _row_spec(grp, n, c),
            _mask_spec(grp, c),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, n, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(grp, n, c),
        ],
        out_specs=[
            _row_spec(grp, n, c),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), g.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, mask.astype(x.dtype), weight.astype(jnp.float32), stats, g)
    return gx, gw[0], gb[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_layer_norm_pallas(x: Array, weight: Array, bias: Array,
                             mask: Array, eps: float = 1e-6) -> Array:
    y, _ = _forward(x, mask, weight, bias, eps)
    return y


def _fwd_full(x, weight, bias, mask, eps):
    y, stats = _forward(x, mask, weight, bias, eps)
    return y, (x, stats, mask, weight)


def _bwd_full(eps, residuals, g):
    x, stats, mask, weight = residuals
    gx, gw, gb = _backward(x, mask, weight, stats, g)
    return (gx, gw.astype(jnp.float32), gb.astype(jnp.float32),
            jnp.zeros(mask.shape, jnp.float32))


masked_layer_norm_pallas.defvjp(_fwd_full, _bwd_full)


def supported(x: Array, mask: Optional[Array]) -> bool:
    """Whether the Pallas kernel can handle this shape."""
    if mask is None or x.ndim != 3 or mask.ndim != 3:
        return False
    c = x.shape[-1]
    return (c % 128 == 0 and mask.shape[0] == x.shape[0]
            and mask.shape[1] == 1 and mask.shape[-1] == c)
