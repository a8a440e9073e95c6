"""Pallas TPU kernel: one-pass row statistics (sum, sum-of-squares).

The XLA lowering of masked layer norm runs TWO separate row-reduction
kernels per LN (``mean(x)`` and ``mean(x**2)``), reading ``x`` from HBM
twice — profiled at ~18 ms/step across the supernet's 39 masked LNs at
batch 512 (PERF.md).  An XLA-level one-pass attempt (``stack([x, x**2])``
then one mean) lost 6.6% end-to-end because XLA materialized the stacked
operand.  This kernel emits both sums from ONE read of ``x`` and nothing
else: the mask correction, normalize, affine and re-mask multiplies stay
in XLA where they fuse with the surrounding residual/mask arithmetic —
the failure mode of the full fused-LN kernel (masked_ln.py, kept opt-in)
was exactly that it broke those fusions.

Numerics: float32 accumulation regardless of input dtype, matching the
reference's ``custom_fwd(cast_inputs=float32)`` statistics
(/root/reference/nets/masked_layer_norm.py:22,30-42).

The custom VJP keeps the backward in plain XLA (``gx = g1 + 2*x*g2``
broadcasts, elementwise — they fuse into the surrounding backward).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stats_kernel(x_ref, s1_ref, s2_ref):
    x = x_ref[...].astype(jnp.float32)        # (g, n, C)
    s1_ref[...] = jnp.sum(x, axis=-1)         # (g, n)
    s2_ref[...] = jnp.sum(x * x, axis=-1)


def _pick_group(b: int, n: int, c: int) -> int:
    # one bf16/f32 input block (double-buffered) + f32 upcast + two (g, n)
    # outputs; stay well inside the ~16 MB VMEM
    budget = 8 * 1024 * 1024
    per_row = 3 * n * c * 4
    g = max(1, min(b, budget // max(per_row, 1), 16))
    while b % g:
        g -= 1
    return g


def _stats_call(x: Array) -> Tuple[Array, Array]:
    b, n, c = x.shape
    g = _pick_group(b, n, c)
    return pl.pallas_call(
        _stats_kernel,
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((g, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2,
        interpret=_interpret(),
    )(x)


@jax.custom_vjp
def row_sum_sumsq(x: Array) -> Tuple[Array, Array]:
    """``(sum_C(x), sum_C(x**2))`` over the last axis of ``(B, N, C)``,
    float32, in one HBM read."""
    return _stats_call(x)


def _fwd(x):
    return _stats_call(x), (x,)


def _bwd(residuals, g):
    (x,) = residuals
    g1, g2 = g
    gx = (g1[..., None] + 2.0 * x.astype(jnp.float32) * g2[..., None])
    return (gx.astype(x.dtype),)


row_sum_sumsq.defvjp(_fwd, _bwd)


def supported(x: Array) -> bool:
    return x.ndim == 3 and x.shape[-1] % 128 == 0 and x.shape[1] >= 1
