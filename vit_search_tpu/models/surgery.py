"""Parameter surgery: subnet extraction, rewiring, pos-embed interpolation.

- :func:`slice_subnet_params` — materialize a sub-architecture's parameters
  by prefix-slicing the supernet's (every axis; qkv kernels sliced per
  q/k/v third).  Valid because channel masks always keep a prefix and
  rewiring keeps important channels at the front.
  Reference: nets/net_utils.py:10-57.
- :func:`rewire_params` — epoch-boundary magnitude re-sorting of MLP hidden
  units and attention heads so prefix slices carry the most important
  channels.  Reference: nets/supernet_blocks.py:55-71 (MLP) and :123-161
  (attention heads).  Like the reference, optimizer state is left
  unpermuted.
- :func:`interpolate_pos_embeds` — bicubic position-embedding resize for
  higher-resolution finetuning; the stage-0 table splits off its cls/distill
  token rows, SR-block tables have none.
  Reference: network_utils/finetune_state_dict.py:24-66.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..arch import network_def as nd


# --- subnet extraction -----------------------------------------------------


def _slice_qkv(src: jnp.ndarray, dst_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Prefix-slice each q/k/v third along the fused output axis.

    Kernels are ``(in, 3W)``, biases ``(3W,)``; the reference slices the
    torch-transposed layout the same way (nets/net_utils.py:10-31).
    """
    out_axis = len(dst_shape) - 1
    src_w = src.shape[out_axis] // 3
    dst_w = dst_shape[out_axis] // 3
    thirds = [
        jax.lax.slice_in_dim(src, i * src_w, i * src_w + dst_w, axis=out_axis)
        for i in range(3)
    ]
    merged = jnp.concatenate(thirds, axis=out_axis)
    return merged[tuple(slice(0, d) for d in dst_shape)]


def _prefix_slice(src: jnp.ndarray, dst_shape: Tuple[int, ...]) -> jnp.ndarray:
    if src.ndim != len(dst_shape):
        raise ValueError(f"rank mismatch: {src.shape} -> {dst_shape}")
    return src[tuple(slice(0, d) for d in dst_shape)]


def slice_subnet_params(super_tree: Dict, sub_tree: Dict) -> Dict:
    """Fill ``sub_tree``-shaped parameters from ``super_tree`` prefix slices.

    ``sub_tree`` supplies the target structure/shapes (e.g. from
    ``model.init`` of the subnet); every leaf present in the subnet must
    exist in the supernet under the same path.
    """
    flat_sub = jax.tree_util.tree_flatten_with_path(sub_tree)[0]
    flat_super = dict(jax.tree_util.tree_flatten_with_path(super_tree)[0])

    out = {}
    for path, leaf in flat_sub:
        if path not in flat_super:
            raise KeyError(f"subnet leaf {jax.tree_util.keystr(path)} missing in supernet")
        src = flat_super[path]
        is_qkv = any(getattr(p, "key", None) == "qkv" for p in path)
        out[path] = (_slice_qkv(src, leaf.shape) if is_qkv
                     else _prefix_slice(src, leaf.shape)).astype(leaf.dtype)

    treedef = jax.tree_util.tree_structure(sub_tree)
    return jax.tree_util.tree_unflatten(treedef, [out[p] for p, _ in flat_sub])


# --- rewiring -----------------------------------------------------------------


def rewire_mlp(mlp: Dict) -> Dict:
    """Sort MLP hidden units by aggregate weight magnitude (descending).

    Importance = sum|fc2 out-rows| + sum|fc1 in-cols| + |fc1 bias|
    (reference: nets/supernet_blocks.py:55-71).
    """
    fc1_k, fc1_b = mlp["fc1"]["kernel"], mlp["fc1"]["bias"]   # (in, H), (H,)
    fc2_k = mlp["fc2"]["kernel"]                               # (H, out)
    importance = (jnp.sum(jnp.abs(fc2_k), axis=1)
                  + jnp.sum(jnp.abs(fc1_k), axis=0)
                  + jnp.abs(fc1_b))
    order = jnp.argsort(-importance, stable=True)
    return {
        "fc1": {"kernel": fc1_k[:, order], "bias": fc1_b[order]},
        "fc2": {"kernel": fc2_k[order, :], "bias": mlp["fc2"]["bias"]},
    }


def rewire_attention(attn: Dict, num_heads: int, head_dim: int) -> Dict:
    """Sort attention heads by aggregate weight magnitude (descending).

    Importance per head = sum|qkv weights| + sum|qkv bias| + sum|proj in-rows|
    (reference: nets/supernet_blocks.py:123-161); the permutation is applied
    consistently within each q/k/v third and to the projection input.
    """
    qkv_k, qkv_b = attn["qkv"]["kernel"], attn["qkv"]["bias"]  # (C, 3Hd), (3Hd,)
    proj_k = attn["proj"]["kernel"]                            # (Hd, C)
    c_in = qkv_k.shape[0]

    k_heads = qkv_k.reshape(c_in, 3, num_heads, head_dim)
    b_heads = qkv_b.reshape(3, num_heads, head_dim)
    p_heads = proj_k.reshape(num_heads, head_dim, -1)

    importance = (jnp.sum(jnp.abs(k_heads), axis=(0, 1, 3))
                  + jnp.sum(jnp.abs(b_heads), axis=(0, 2))
                  + jnp.sum(jnp.abs(p_heads), axis=(1, 2)))
    order = jnp.argsort(-importance, stable=True)

    return {
        "qkv": {
            "kernel": k_heads[:, :, order, :].reshape(c_in, 3 * num_heads * head_dim),
            "bias": b_heads[:, order, :].reshape(3 * num_heads * head_dim),
        },
        "proj": {"kernel": p_heads[order].reshape(num_heads * head_dim, -1),
                 "bias": attn["proj"]["bias"]},
    }


def rewire_params(params: Dict, network_def: Sequence) -> Dict:
    """Apply per-block rewiring to every existing transformer block."""
    params = dict(params)
    for slot, block in enumerate(network_def):
        if nd.block_type(block) != nd.TRANSFORMER:
            continue
        tdef = nd.transformer_def(block)
        if not tdef.exists:
            continue
        name = f"blocks_{slot}"
        blk = dict(params[name])
        blk["attn"] = rewire_attention(blk["attn"], tdef.num_heads, tdef.head_dim)
        blk["mlp"] = rewire_mlp(blk["mlp"])
        params[name] = blk
    return params


# --- position-embedding interpolation -----------------------------------------


def _resize_table(table: jnp.ndarray, num_tokens: int, dst_len: int) -> jnp.ndarray:
    """Bicubic-resize the grid part of a ``(1, T+G*G, C)`` table."""
    src_len = table.shape[1]
    if src_len == dst_len:
        return table
    tokens, grid_part = table[:, :num_tokens], table[:, num_tokens:]
    src_g = int(math.isqrt(grid_part.shape[1]))
    dst_g = int(math.isqrt(dst_len - num_tokens))
    assert src_g * src_g == grid_part.shape[1], "non-square source grid"
    assert dst_g * dst_g == dst_len - num_tokens, "non-square target grid"
    c = grid_part.shape[-1]
    grid = grid_part.reshape(1, src_g, src_g, c)
    grid = jax.image.resize(grid, (1, dst_g, dst_g, c), method="bicubic")
    grid = grid.reshape(1, dst_g * dst_g, c)
    return jnp.concatenate([tokens, grid], axis=1)


def interpolate_pos_embeds(src_params: Dict, dst_params: Dict,
                           num_tokens: int) -> Dict:
    """Copy ``src_params`` into ``dst_params``' structure, bicubically
    resizing every position-embedding table whose length differs.

    The top-level ``pos_embed`` owns ``num_tokens`` leading token rows; SR
    blocks' tables are all-grid (reference:
    network_utils/finetune_state_dict.py:24-66).
    """
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src_params)[0])
    flat_dst = jax.tree_util.tree_flatten_with_path(dst_params)[0]

    out = {}
    for path, leaf in flat_dst:
        if path not in flat_src:
            raise KeyError(f"target leaf {jax.tree_util.keystr(path)} missing in source")
        src = flat_src[path]
        keys = [getattr(p, "key", None) for p in path]
        if keys[-1] == "pos_embed" and src.shape != leaf.shape:
            toks = num_tokens if len(keys) == 1 else 0  # SR tables have no token rows
            out[path] = _resize_table(src, toks, leaf.shape[1]).astype(leaf.dtype)
        else:
            if src.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch at {jax.tree_util.keystr(path)}: "
                    f"{src.shape} vs {leaf.shape}")
            out[path] = src.astype(leaf.dtype)

    treedef = jax.tree_util.tree_structure(dst_params)
    return jax.tree_util.tree_unflatten(treedef, [out[p] for p, _ in flat_dst])
