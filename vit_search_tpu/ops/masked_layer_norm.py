"""Masked layer normalization.

Layer norm whose statistics are corrected for masked-out (zeroed) trailing
channels: with ``p`` the fraction of unmasked channels, the plain channel
means of ``x`` and ``x**2`` are rescaled by ``1/p`` so they equal the masked
means (valid because masked channels hold zeros).  Numerics match the
reference custom autograd function (nets/masked_layer_norm.py:19-88):

    p       = mean_C(mask)
    mu      = mean_C(x) / p
    var     = mean_C(x^2) / p - mu^2
    y       = weight * (x - mu) * rsqrt(var + eps) + bias

The reference hand-written backward is exactly the analytic gradient of this
forward (its ``inv_unmask_percent`` placement falls out of differentiating
the ``/p``-corrected moments), so plain JAX autodiff reproduces it; no
custom VJP is needed for parity.  Statistics are computed in float32
regardless of input dtype (matching ``torch.cuda.amp.custom_fwd(
cast_inputs=float32)``), which is also the right call for bf16 TPU training.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

# Opt-in Pallas kernel (fwd + fused bwd) for the masked path
# (VST_PALLAS_LN=1).  Profiled OFF as the default on v5e: the custom-call
# boundary stops XLA from fusing the surrounding mask multiplies / residual
# adds into the LN, and the net step time is ~7% worse than the XLA lowering
# (200.7 vs 187.4 ms/step on the b512 supernet bench) even though the kernel
# itself replaces the stat-reduction kernels.  The plain-JAX path below is
# the reference numerics and the fallback for unsupported shapes.
_USE_PALLAS = os.environ.get("VST_PALLAS_LN", "0") == "1"

# One-pass Pallas statistics kernel (sum, sumsq from one HBM read of x),
# leaving the normalize/mask multiplies to XLA so the surrounding fusions
# survive — the narrow attack on the stat-reduction cost (PERF.md round 3).
_USE_PALLAS_STATS = os.environ.get("VST_PALLAS_LN_STATS", "0") == "1"


def masked_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                      mask: Optional[jnp.ndarray], eps: float = 1e-6) -> jnp.ndarray:
    """Apply masked layer norm over the last axis.

    Args:
      x: ``(..., N, C)`` activations with masked channels already zeroed.
      weight, bias: ``(C,)`` affine parameters.
      mask: ``(..., 1, C)`` boolean/0-1 mask, or ``None`` for dense layer norm.

    Returns:
      Normalized output in ``x.dtype``; re-masked (``y * mask``) when a mask
      is given (reference: nets/masked_layer_norm.py:113-125).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    b = bias.astype(jnp.float32)

    if mask is None:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + eps)
        return (w * y + b).astype(dtype)

    if _USE_PALLAS:
        from .pallas import masked_layer_norm_pallas, masked_ln_supported

        m = mask
        if m.ndim == x.ndim and m.shape[0] == 1 and x.shape[0] != 1:
            m = jnp.broadcast_to(m, (x.shape[0],) + m.shape[1:])
        if masked_ln_supported(x, m):
            return masked_layer_norm_pallas(x, weight, bias,
                                            m.astype(x.dtype), eps)

    maskf = mask.astype(jnp.float32)
    inv_p = 1.0 / jnp.mean(maskf, axis=-1, keepdims=True)
    if _USE_PALLAS_STATS and x.ndim == 3:
        from .pallas.stats import row_sum_sumsq
        from .pallas.stats import supported as stats_supported

        if stats_supported(x):
            inv_c = 1.0 / x.shape[-1]
            s1, s2 = row_sum_sumsq(x)
            mu = s1[..., None] * (inv_p * inv_c)
            x2 = s2[..., None] * (inv_p * inv_c)
            var = x2 - jnp.square(mu)
            z = (xf - mu) / jnp.sqrt(var + eps)
            y = w * z + b
            return (y * maskf).astype(dtype)
    mu = jnp.mean(xf, axis=-1, keepdims=True) * inv_p
    x2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) * inv_p
    var = x2 - jnp.square(mu)
    z = (xf - mu) / jnp.sqrt(var + eps)
    y = w * z + b
    return (y * maskf).astype(dtype)
