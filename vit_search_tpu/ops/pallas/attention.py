"""Pallas TPU kernel: fused whole-sequence multi-head attention.

ViT-ResNAS sequences are short (<=258 tokens after the 14px patchify, 2x
shorter per SR stage), so full (N, N) score tiles fit in VMEM — no
online-softmax tiling needed.  What matters is HBM traffic: the XLA
lowering materializes float32 score/probability tensors per layer (profiled
at ~1.2 GB of HBM traffic per stage-1 attention fusion at batch 256); this
kernel keeps scores and probabilities entirely in VMEM.

Layout: q/k/v arrive as ``(B, N, H*D)`` — the natural packed projection
layout, so no transposes are materialized around the kernel (profiled at
~12 ms/step for the (B*H, N, D) variant).  The grid tiles the batch; heads
are a static in-kernel loop, one score tile live at a time.

The custom VJP recomputes probabilities in the backward kernel
(flash-attention residual strategy: nothing saved but the inputs).

Numerics: scores/softmax in float32; probabilities cast to the value dtype
for the context matmul, matching the plain-JAX path in models.layers.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_QK_T = (((2,), (2,)), ((0,), (0,)))   # (G,N,D) x (G,M,D) -> (G,N,M)
_PV = (((2,), (1,)), ((0,), (0,)))     # (G,N,M) x (G,M,D) -> (G,N,D)
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # contract over N: (G,N,M),(G,N,D) -> (G,M,D)


def _softmax_rows(s: Array) -> Array:
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, num_heads: int):
    width = q_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, _QK_T,
                                preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)
        v = v_ref[:, :, sl]
        o = jax.lax.dot_general(p.astype(v.dtype), v, _PV,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, num_heads: int):
    width = q_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[:, :, sl].astype(jnp.float32)
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        do = do_ref[:, :, sl].astype(jnp.float32)

        s = jax.lax.dot_general(q, k, _QK_T,
                                preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)

        dv = jax.lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QK_T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _fwd_kernel_qkv(qkv_ref, o_ref, *, scale: float, num_heads: int):
    """Forward over the packed projection output ``(G, N, 3*W)``.

    Slicing q/k/v happens on the VMEM block, so the XLA-level slice copies
    (profiled at ~8.5 ms/step at batch 512) never materialize in HBM.
    """
    width = o_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv_ref[:, :, width + h * d:width + (h + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, _QK_T,
                                preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)
        v = qkv_ref[:, :, 2 * width + h * d:2 * width + (h + 1) * d]
        o = jax.lax.dot_general(p.astype(v.dtype), v, _PV,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _bwd_kernel_qkv(qkv_ref, do_ref, dqkv_ref, *, scale: float,
                    num_heads: int):
    """Backward producing the packed cotangent ``(G, N, 3*W)`` directly —
    the qkv Dense VJP consumes it without a concatenate."""
    width = do_ref.shape[-1]
    d = width // num_heads
    for h in range(num_heads):
        qsl = slice(h * d, (h + 1) * d)
        ksl = slice(width + h * d, width + (h + 1) * d)
        vsl = slice(2 * width + h * d, 2 * width + (h + 1) * d)
        q = qkv_ref[:, :, qsl].astype(jnp.float32)
        k = qkv_ref[:, :, ksl].astype(jnp.float32)
        v = qkv_ref[:, :, vsl].astype(jnp.float32)
        do = do_ref[:, :, qsl].astype(jnp.float32)

        s = jax.lax.dot_general(q, k, _QK_T,
                                preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(s)

        dv = jax.lax.dot_general(p, do, _PT_DO, preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QK_T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

        dqkv_ref[:, :, qsl] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, ksl] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, vsl] = dv.astype(dqkv_ref.dtype)


def _pick_group(b: int, n: int, width: int, score_tiles: int,
                io_rows: int, itemsize: int = 2) -> int:
    """Batch rows per grid cell under a VMEM budget (v5e: ~16 MB/core).

    ``score_tiles`` counts MAX-LIVE (n, n) f32 temporaries per head — the
    per-head dots are sequential, so fwd holds s/p (2) and bwd p/dp/ds (3;
    s's buffer is dead once p exists).  ``io_rows`` counts width-columns of
    I/O blocks (double-buffered by the pipeline, hence the factor 2):
    fwd qkv-in + o-out = 4, bwd qkv-in + do-in + dqkv-out = 7.

    Round-3 sweep (PERF.md): larger groups are uniformly faster until the
    compile OOMs — stage2 bwd g=4 -> 8 alone was -21% — so the budget is
    set just under the measured compile ceiling (stage1 bwd g=8 OOMs,
    g=4 compiles and is -10% vs g=2).
    """
    budget = 12 * 1024 * 1024
    per_row = score_tiles * n * n * 4 + 2 * io_rows * n * width * itemsize
    g = max(1, min(b, budget // per_row, 16))
    while b % g:
        g -= 1
    return g


def _spec(g: int, n: int, width: int):
    return pl.BlockSpec((g, n, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(q: Array, k: Array, v: Array, scale: float, num_heads: int) -> Array:
    b, n, width = q.shape
    g = _pick_group(b, n, width, score_tiles=2, io_rows=4,
                    itemsize=q.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads),
        grid=(b // g,),
        in_specs=[_spec(g, n, width)] * 3,
        out_specs=_spec(g, n, width),
        out_shape=jax.ShapeDtypeStruct((b, n, width), q.dtype),
        interpret=_interpret(),
    )(q, k, v)


def _bwd_call(q, k, v, do, scale: float, num_heads: int):
    b, n, width = q.shape
    g = _pick_group(b, n, width, score_tiles=3, io_rows=7,
                    itemsize=q.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=num_heads),
        grid=(b // g,),
        in_specs=[_spec(g, n, width)] * 4,
        out_specs=[_spec(g, n, width)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, n, width), q.dtype)] * 3,
        interpret=_interpret(),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_packed(q: Array, k: Array, v: Array, scale: float,
                           num_heads: int) -> Array:
    """Multi-head attention over packed ``(B, N, H*D)`` q/k/v."""
    return _attn_fwd(q, k, v, scale, num_heads)[0]


def _attn_fwd(q, k, v, scale, num_heads) -> Tuple[Array, tuple]:
    return _fwd_call(q, k, v, scale, num_heads), (q, k, v)


def _attn_bwd(scale, num_heads, residuals, g):
    q, k, v = residuals
    return tuple(_bwd_call(q, k, v, g, scale, num_heads))


fused_attention_packed.defvjp(_attn_fwd, _attn_bwd)


def _fwd_call_qkv(qkv: Array, scale: float, num_heads: int) -> Array:
    b, n, width3 = qkv.shape
    width = width3 // 3
    g = _pick_group(b, n, width, score_tiles=2, io_rows=4,
                    itemsize=qkv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_qkv, scale=scale, num_heads=num_heads),
        grid=(b // g,),
        in_specs=[_spec(g, n, width3)],
        out_specs=_spec(g, n, width),
        out_shape=jax.ShapeDtypeStruct((b, n, width), qkv.dtype),
        interpret=_interpret(),
    )(qkv)


def _bwd_call_qkv(qkv: Array, do: Array, scale: float, num_heads: int) -> Array:
    b, n, width3 = qkv.shape
    width = width3 // 3
    g = _pick_group(b, n, width, score_tiles=3, io_rows=7,
                    itemsize=qkv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_qkv, scale=scale, num_heads=num_heads),
        grid=(b // g,),
        in_specs=[_spec(g, n, width3), _spec(g, n, width)],
        out_specs=_spec(g, n, width3),
        out_shape=jax.ShapeDtypeStruct((b, n, width3), qkv.dtype),
        interpret=_interpret(),
    )(qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_qkv(qkv: Array, scale: float, num_heads: int) -> Array:
    """Multi-head attention straight off the packed ``(B, N, 3*H*D)``
    projection output (column blocks ordered [q | k | v])."""
    return _attn_qkv_fwd(qkv, scale, num_heads)[0]


def _attn_qkv_fwd(qkv, scale, num_heads):
    return _fwd_call_qkv(qkv, scale, num_heads), (qkv,)


def _attn_qkv_bwd(scale, num_heads, residuals, g):
    (qkv,) = residuals
    return (_bwd_call_qkv(qkv, g, scale, num_heads),)


fused_attention_qkv.defvjp(_attn_qkv_fwd, _attn_qkv_bwd)


# ---------------------------------------------------------------------------
# Sequence-major variant (VST_PALLAS_ATTN_T=1) — REJECTED on TPU, kept as
# the measured record (PERF.md round 5) with CPU-interpret parity tests.
#
# Hypothesis: XLA's layout assignment prefers {2,0,1} (sequence-major
# physical order) for the fusion outputs feeding these custom-calls, while
# pallas_call pins default {2,1,0} layouts — profiled at ~13 ms/step of
# layout copies.  Moving the kernel's logical shapes to (N, B, 3W) would
# make the host-side transposes match the producer's preferred physical
# layout, so XLA could assign layouts that make them bitcasts.
#
# Measured outcome (round 5): every way of feeding the MXU from a
# sequence-major VMEM block fails to compile on Mosaic —
#  (a) the (N, G, ·) block layout forces the group G into the
#      second-to-last block dim, which Mosaic requires to be a multiple
#      of 8; g=8 exceeds the 16 MB default scoped-VMEM budget at stage-1
#      shapes (17.67 MB measured; fixable per-kernel via
#      CompilerParams(vmem_limit_bytes), kept below);
#  (b) whole-block in-VMEM swapaxes to batch-major: the Mosaic compile
#      helper is OOM-killed (SIGKILL);
#  (c) per-head (N, G, D) swapaxes: stage-1 forward compiles, backward
#      compile exceeds 500 s (pathological relayout codegen at N=257);
#  (d) per-(head, row) 2-D dots over natural (N, D) slices (the version
#      below): "infer-vector-layout: unsupported shape cast" — squeezing
#      the G dim out of a sequence-major block is not a relayout Mosaic
#      can infer.
# BlockSpec index maps cannot permute dims, so there is no fifth option:
# the ~13 ms/step of layout copies around the batch-major custom-calls is
# not removable from today's Pallas/Mosaic surface.
# ---------------------------------------------------------------------------

# 2-D dot dims for the sequence-major kernels: no batch dims at all, so the
# (N, ...)-major refs are consumed in their natural orientation — no in-VMEM
# relayouts (whole-block or per-head swapaxes both blow the Mosaic compile
# at the g>=8 this layout forces; measured round 5).
_QK_T2 = (((1,), (1,)), ((), ()))   # (N, D) x (N, D) -> (N, N)
_PV2 = (((1,), (0,)), ((), ()))     # (N, N) x (N, D) -> (N, D)
_PT2 = (((0,), (0,)), ((), ()))     # (N, N)^T x (N, D) -> (N, D)


def _fwd_kernel_qkv_t(qkv_ref, o_ref, *, scale: float, num_heads: int):
    """Forward over sequence-major packed projection ``(N, G, 3*W)``.

    The per-(head, batch-row) dots are plain 2-D matmuls over natural
    sequence-major slices — the MXU work is identical to the batch-major
    kernel's batched dots (those unroll over the batch dim anyway), with
    zero relayout code.
    """
    width = o_ref.shape[-1]
    d = width // num_heads
    g = qkv_ref.shape[1]
    for j in range(g):
        for h in range(num_heads):
            qsl = slice(h * d, (h + 1) * d)
            q = qkv_ref[:, j, qsl].astype(jnp.float32)
            k = qkv_ref[:, j, width + h * d:width + (h + 1) * d].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, _QK_T2,
                                    preferred_element_type=jnp.float32) * scale
            p = _softmax_rows(s)
            v = qkv_ref[:, j, 2 * width + h * d:2 * width + (h + 1) * d]
            o = jax.lax.dot_general(p.astype(v.dtype), v, _PV2,
                                    preferred_element_type=jnp.float32)
            o_ref[:, j, qsl] = o.astype(o_ref.dtype)


def _bwd_kernel_qkv_t(qkv_ref, do_ref, dqkv_ref, *, scale: float,
                      num_heads: int):
    """Backward over sequence-major blocks; packed (N, G, 3W) cotangent.

    Per-(head, batch-row) 2-D dots over natural slices (see the forward
    kernel's note) — cotangent slices store straight back into the
    sequence-major ref, no relayouts.
    """
    width = do_ref.shape[-1]
    d = width // num_heads
    g = do_ref.shape[1]
    for j in range(g):
        for h in range(num_heads):
            qsl = slice(h * d, (h + 1) * d)
            ksl = slice(width + h * d, width + (h + 1) * d)
            vsl = slice(2 * width + h * d, 2 * width + (h + 1) * d)
            q = qkv_ref[:, j, qsl].astype(jnp.float32)
            k = qkv_ref[:, j, ksl].astype(jnp.float32)
            v = qkv_ref[:, j, vsl].astype(jnp.float32)
            do = do_ref[:, j, qsl].astype(jnp.float32)

            s = jax.lax.dot_general(q, k, _QK_T2,
                                    preferred_element_type=jnp.float32) * scale
            p = _softmax_rows(s)                          # (N, M)

            dv = jax.lax.dot_general(p, do, _PT2,
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, _QK_T2,
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq = jax.lax.dot_general(ds, k, _PV2,
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds, q, _PT2,
                                     preferred_element_type=jnp.float32) * scale
            dqkv_ref[:, j, qsl] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[:, j, ksl] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[:, j, vsl] = dv.astype(dqkv_ref.dtype)


def _spec_t(g: int, n: int, width: int):
    return pl.BlockSpec((n, g, width), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _pick_group_t(b: int, n: int, width: int, score_tiles: int,
                  io_rows: int, itemsize: int = 2) -> int:
    """Group size for the sequence-major blocks.

    Mosaic requires the second-to-last block dim (the group, here) to be a
    multiple of 8 or the full array dim, so the budget-picked group is
    rounded UP to 8 when smaller — the _t layout cannot trade group size
    below that for VMEM the way the batch-major kernels can.  This is a
    structural handicap of the layout, measured in PERF.md round 5.
    """
    g = _pick_group(b, n, width, score_tiles, io_rows, itemsize)
    if g % 8:
        g = 8 if b % 8 == 0 else b
    while b % g:
        g -= 8
    return max(g, min(8, b))


def _params_t():
    """The g>=8 the sequence-major layout forces needs more than the
    16 MB default scoped-VMEM budget at stage-1 shapes; request a higher
    per-kernel limit (honored only if the backend's
    --xla_tpu_scoped_vmem_limit_kib ceiling allows it)."""
    limit = int(os.environ.get("VST_ATTN_T_VMEM_MB", "40")) * 1024 * 1024
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _fwd_call_qkv_t(qkv: Array, scale: float, num_heads: int) -> Array:
    n, b, width3 = qkv.shape
    width = width3 // 3
    g = _pick_group_t(b, n, width, score_tiles=2, io_rows=4,
                      itemsize=qkv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_qkv_t, scale=scale, num_heads=num_heads),
        grid=(b // g,),
        in_specs=[_spec_t(g, n, width3)],
        out_specs=_spec_t(g, n, width),
        out_shape=jax.ShapeDtypeStruct((n, b, width), qkv.dtype),
        compiler_params=_params_t(),
        interpret=_interpret(),
    )(qkv)


def _bwd_call_qkv_t(qkv: Array, do: Array, scale: float,
                    num_heads: int) -> Array:
    n, b, width3 = qkv.shape
    width = width3 // 3
    g = _pick_group_t(b, n, width, score_tiles=3, io_rows=7,
                      itemsize=qkv.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_qkv_t, scale=scale, num_heads=num_heads),
        grid=(b // g,),
        in_specs=[_spec_t(g, n, width3), _spec_t(g, n, width)],
        out_specs=_spec_t(g, n, width3),
        out_shape=jax.ShapeDtypeStruct((n, b, width3), qkv.dtype),
        compiler_params=_params_t(),
        interpret=_interpret(),
    )(qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_qkv_t(qkv_t: Array, scale: float, num_heads: int) -> Array:
    """Sequence-major fused attention: ``(N, B, 3W) -> (N, B, W)``."""
    return _attn_qkv_t_fwd(qkv_t, scale, num_heads)[0]


def _attn_qkv_t_fwd(qkv_t, scale, num_heads):
    return _fwd_call_qkv_t(qkv_t, scale, num_heads), (qkv_t,)


def _attn_qkv_t_bwd(scale, num_heads, residuals, g):
    (qkv_t,) = residuals
    return (_bwd_call_qkv_t(qkv_t, g, scale, num_heads),)


fused_attention_qkv_t.defvjp(_attn_qkv_t_fwd, _attn_qkv_t_bwd)


def fused_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """softmax(q @ k^T * scale) @ v over (B, N, H, D) inputs."""
    b, n, h, d = q.shape
    out = fused_attention_packed(q.reshape(b, n, h * d), k.reshape(b, n, h * d),
                                 v.reshape(b, n, h * d), scale, h)
    return out.reshape(b, n, h, d)


def supported(n: int, d: int, attn_dropout_rate: float) -> bool:
    """The kernel covers dropout-free attention (every published recipe)."""
    return attn_dropout_rate == 0.0 and n >= 8 and d >= 8
