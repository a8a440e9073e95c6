"""Masked transformer building blocks (flax.linen).

TPU redesign of the reference supernet blocks (nets/supernet_blocks.py):
channel masks arrive as *call arguments* — ``(B, 1, width)`` arrays built
from per-step keep counts — instead of stateful ChannelDrop modules, so one
compiled program serves every sampled architecture.

Mask algebra (faithful to nets/supernet_blocks.py:209-255):
  - attention mask zeroes trailing heads' outputs before the projection,
  - MLP mask zeroes trailing hidden units between fc1 and fc2,
  - the layer mask (all-or-nothing per example) is ANDed with the previous
    block's layer mask and the stage embed mask, and multiplies both residual
    branches — dropping a block for the examples where it is "removed".
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import drop_path as _drop_path
from ..ops import masked_layer_norm as _masked_ln

# Fused Pallas attention (scores/probs stay in VMEM).  Opt-out via
# VST_PALLAS_ATTN=0; the XLA path materializes f32 probability tensors in
# HBM, which profiling shows is the dominant memory traffic at ViT-ResNAS
# sequence lengths.
_USE_PALLAS_ATTN = os.environ.get("VST_PALLAS_ATTN", "1") == "1"

Array = jnp.ndarray

_INIT_STD = 0.02

trunc_normal_init = nn.initializers.truncated_normal(stddev=_INIT_STD, lower=-2.0, upper=2.0)


def apply_mask(x: Array, mask: Optional[Array]) -> Array:
    """Zero masked channels; no-op for ``None``."""
    if mask is None:
        return x
    return x * mask.astype(x.dtype)


def combine_masks(a: Optional[Array], b: Optional[Array]) -> Optional[Array]:
    """AND of two optional boolean masks."""
    if a is None:
        return b
    if b is None:
        return a
    return jnp.logical_and(a.astype(bool), b.astype(bool))


class MaskedLayerNorm(nn.Module):
    """Layer norm with masked-channel-corrected statistics.

    Reference: nets/masked_layer_norm.py (see ops.masked_layer_norm for the
    numerics); parameters match nn.LayerNorm (always affine).
    """

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        weight = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return _masked_ln(x, weight, bias, mask, self.eps)


class Mlp(nn.Module):
    """fc1 -> GELU -> dropout -> [hidden mask] -> fc2 -> dropout.

    Reference: nets/supernet_blocks.py:17-52.
    """

    hidden_features: int
    out_features: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hidden_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> Array:
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc1")(x)
        # VST_GELU=tanh opts into the tanh approximation (read at trace
        # time, like VST_PALLAS_ATTN); default is the exact erf form the
        # reference's nn.GELU computes.  Set by the --gelu CLI flag.
        x = nn.gelu(x, approximate=os.environ.get("VST_GELU") == "tanh")
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = apply_mask(x, hidden_mask)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with explicit head_dim and head masking.

    The qkv projection maps ``dim -> 3 * num_heads * head_dim`` (kernel
    column blocks ordered [q | k | v], each block ordered by head) so prefix
    slicing per third extracts a subnet, mirroring the reference weight
    layout contract (nets/supernet_blocks.py:74-120, nets/net_utils.py:10-31).
    Scores/softmax run in float32 for bf16 stability.
    """

    num_heads: int
    head_dim: int
    out_features: int
    attn_dropout_rate: float = 0.0
    proj_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, width_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> Array:
        batch, n_seq, _ = x.shape
        width = self.num_heads * self.head_dim
        scale = self.head_dim ** -0.5

        qkv = nn.Dense(3 * width, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)

        use_fused = _USE_PALLAS_ATTN
        if use_fused:
            from ..ops.pallas.attention import (fused_attention_qkv,
                                                fused_attention_qkv_t,
                                                supported)

            use_fused = supported(n_seq, self.head_dim, self.attn_dropout_rate)
        if use_fused:
            if os.environ.get("VST_PALLAS_ATTN_T") == "1":
                # sequence-major experiment — REJECTED on TPU (Mosaic cannot
                # compile any MXU feed from sequence-major blocks; see
                # ops/pallas/attention.py + PERF.md round 5).  The flag and
                # kernels remain as the measured record; CPU-interpret only.
                out_t = fused_attention_qkv_t(
                    jnp.transpose(qkv, (1, 0, 2)), scale, self.num_heads)
                out = jnp.transpose(out_t, (1, 0, 2))
            else:
                # packed layout straight from the projection: q/k/v slicing
                # happens inside the kernel on the VMEM block (no HBM copies)
                out = fused_attention_qkv(qkv, scale, self.num_heads)
        else:
            qkv = qkv.reshape(batch, n_seq, 3, self.num_heads, self.head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            probs = nn.Dropout(self.attn_dropout_rate,
                               deterministic=deterministic)(probs)
            out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
            out = out.reshape(batch, n_seq, width)
        out = apply_mask(out, width_mask)
        out = nn.Dense(self.out_features, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="proj")(out)
        out = nn.Dropout(self.proj_dropout_rate, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block with attention/MLP/layer masking.

    Signature follows the reference mask threading:
    ``(x, embed_mask, layer_mask, masks) -> (x, new_layer_mask)``
    (nets/supernet_blocks.py:209-255).  ``masks`` is a dict with optional
    ``attn``/``mlp``/``layer`` entries.
    """

    dim: int
    num_heads: int
    head_dim: int
    mlp_hidden: int
    dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _drop_path(self, x: Array, deterministic: bool) -> Array:
        if self.drop_path_rate == 0.0 or deterministic:
            return x
        return _drop_path(x, self.drop_path_rate, self.make_rng("drop_path"),
                          deterministic=False)

    @nn.compact
    def __call__(self, x: Array, embed_mask: Optional[Array] = None,
                 layer_mask: Optional[Array] = None, masks: Optional[dict] = None,
                 deterministic: bool = True):
        # NOTE: ``deterministic`` is positional-or-keyword so nn.remat can
        # mark it static (flax remat traces keyword-only bools).
        masks = masks or {}
        attn_mask = masks.get("attn")
        mlp_mask = masks.get("mlp")
        own_layer_mask = masks.get("layer")

        f = MaskedLayerNorm(self.dim, name="norm1")(x, embed_mask)
        f = Attention(self.num_heads, self.head_dim, self.dim,
                      attn_dropout_rate=self.attn_dropout_rate,
                      proj_dropout_rate=self.dropout_rate,
                      dtype=self.dtype, name="attn")(
                          f, attn_mask, deterministic=deterministic)
        f = self._drop_path(f, deterministic)

        # layer-mask chaining: only blocks with their own layer site consider
        # the incoming mask (nets/supernet_blocks.py:218-227)
        if own_layer_mask is not None:
            f = apply_mask(f, own_layer_mask)
            current = combine_masks(own_layer_mask, layer_mask)
        else:
            current = None

        if embed_mask is not None:
            current = embed_mask if current is None else combine_masks(current, embed_mask)
            f = apply_mask(f, current)

        x = x + f

        f = MaskedLayerNorm(self.dim, name="norm2")(x, embed_mask)
        f = Mlp(self.mlp_hidden, self.dim, dropout_rate=self.dropout_rate,
                dtype=self.dtype, name="mlp")(f, mlp_mask, deterministic=deterministic)
        f = self._drop_path(f, deterministic)
        if current is not None:
            f = apply_mask(f, current)

        x = x + f
        return x, current
