"""Pallas TPU kernel: fused whole-sequence attention.

ViT-ResNAS sequences are short (<=258 tokens after the 14px patchify, 2x
shorter per SR stage), so the full (N, N) score tile fits comfortably in
VMEM — no online-softmax tiling needed.  What matters is HBM traffic: the
XLA lowering materializes float32 score/probability tensors per layer
(profiled at ~1.2 GB of HBM traffic per stage-1 attention fusion at batch
256); this kernel keeps scores and probabilities entirely in VMEM, reading
q/k/v once and writing the context output once.

Forward grid: one (batch*head) row per cell.  The custom VJP recomputes the
probabilities in the backward kernel (flash-attention residual strategy:
nothing is saved but the inputs), producing dq/dk/dv in one pass.

Numerics: scores/softmax in float32; probabilities are cast to the value
dtype before the context matmul, matching the plain-JAX path in
models.layers.Attention.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


# batched-contraction dims for (G, N, D) blocks
_QK_T = (((2,), (2,)), ((0,), (0,)))   # (G,N,D) x (G,M,D) -> (G,N,M)
_PV = (((2,), (1,)), ((0,), (0,)))     # (G,N,M) x (G,M,D) -> (G,N,D)
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # (G,N,M)^T-ish: contract over N


def _softmax_rows(s: Array) -> Array:
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, _QK_T, preferred_element_type=jnp.float32) * scale
    p = _softmax_rows(s)
    v = v_ref[...]
    o = jax.lax.dot_general(p.astype(v.dtype), v, _PV,
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, _QK_T, preferred_element_type=jnp.float32) * scale
    p = _softmax_rows(s)

    dv = jax.lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _QK_T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pick_group(bh: int, n: int, d: int, score_tiles: int) -> int:
    """Rows per grid cell, bounded by a VMEM budget.

    ``score_tiles`` counts live (n, n) f32 temporaries (fwd: s/p; bwd adds
    dp/ds); row tensors (q/k/v/do/outs in f32) add 8*n*d.
    """
    budget = 10 * 1024 * 1024
    per_row = score_tiles * n * n * 4 + 8 * n * d * 4
    g = max(1, min(bh, budget // per_row, 16))
    while bh % g:
        g -= 1
    return g


def _row_spec(g: int, n: int, d: int):
    return pl.BlockSpec((g, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(q3: Array, k3: Array, v3: Array, scale: float) -> Array:
    bh, n, d = q3.shape
    g = _pick_group(bh, n, d, score_tiles=3)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh // g,),
        in_specs=[_row_spec(g, n, d)] * 3,
        out_specs=_row_spec(g, n, d),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q3.dtype),
        interpret=_interpret(),
    )(q3, k3, v3)


def _bwd_call(q3, k3, v3, do3, scale: float):
    bh, n, d = q3.shape
    g = _pick_group(bh, n, d, score_tiles=6)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh // g,),
        in_specs=[_row_spec(g, n, d)] * 4,
        out_specs=[_row_spec(g, n, d)] * 3,
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), q3.dtype)] * 3,
        interpret=_interpret(),
    )(q3, k3, v3, do3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """softmax(q @ k^T * scale) @ v over (B, N, H, D) inputs."""
    return _attn_fwd(q, k, v, scale)[0]


def _to_rows(x: Array) -> Array:
    b, n, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _from_rows(x3: Array, b: int, h: int) -> Array:
    bh, n, d = x3.shape
    return x3.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _attn_fwd(q, k, v, scale) -> Tuple[Array, tuple]:
    b, n, h, d = q.shape
    o3 = _fwd_call(_to_rows(q), _to_rows(k), _to_rows(v), scale)
    return _from_rows(o3, b, h), (q, k, v)


def _attn_bwd(scale, residuals, g):
    q, k, v = residuals
    b, n, h, d = q.shape
    dq3, dk3, dv3 = _bwd_call(_to_rows(q), _to_rows(k), _to_rows(v),
                              _to_rows(g), scale)
    return (_from_rows(dq3, b, h), _from_rows(dk3, b, h), _from_rows(dv3, b, h))


fused_attention.defvjp(_attn_fwd, _attn_bwd)


def supported(n: int, d: int, attn_dropout_rate: float) -> bool:
    """The kernel covers dropout-free attention (every published recipe)."""
    return attn_dropout_rate == 0.0 and n >= 8 and d >= 8
