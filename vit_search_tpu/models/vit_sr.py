"""Multi-stage vision transformer with spatial reduction, built from a
``network_def``.

One flax module covers every reference model family:

- ``FlexibleDistillVisionTransformerSR`` (nets/vit_sr_supernet.py:185-477) —
  multi-stage nets with SR blocks, optional distillation token, optional
  patch head for token mixup;
- ``FlexibleDistillVisionTransformer`` (nets/vision_transformer_supernet.py) —
  the flat defs are just network_defs with no SR blocks;
- ``DistillVisionTransformer`` (nets/data_efficient_image_transformer.py) —
  plain DeiT defs.

Supernet-ness is not baked into the module: the same compiled forward handles
dense nets (``masks=None``) and any sampled sub-architecture (masks built
from keep counts by ``models.supernet``).  Removed blocks (exists=0) become
parameterless bypass slots that reset the layer-mask chain
(reference BypassBlock, nets/vit_sr_supernet.py:50-56).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..arch import network_def as nd
from .layers import (Block, MaskedLayerNorm, apply_mask, trunc_normal_init)
from .patch_embed import PatchConvEmbed, PatchEmbed

Array = jnp.ndarray


class SpatialReductionPatchEmbed(nn.Module):
    """Between-stage token-grid reduction (2x) with width expansion.

    Patch path: masked-LN -> 3x3 stride-2 conv on the reshaped grid -> new
    position embedding; residual avg-pool path zero-padded to out_features.
    Token path: masked-LN -> linear; residual zero-padded.
    Reference: nets/vit_sr_supernet.py:59-172.
    """

    grid: int               # input token-grid side length
    in_features: int
    out_features: int
    num_tokens: int = 1     # cls (+ distill) tokens ahead of the patch tokens
    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @property
    def out_grid(self) -> int:
        return self.grid // self.reduction

    @nn.compact
    def __call__(self, x: Array, embed_mask: Optional[Array] = None,
                 out_mask: Optional[Array] = None,
                 *, deterministic: bool = True) -> Tuple[Array, Optional[Array]]:
        assert self.out_features >= self.in_features
        b = x.shape[0]
        t, g, r = self.num_tokens, self.grid, self.reduction
        pad = self.out_features - self.in_features

        tokens_res = x[:, :t, :]
        patches_res = x[:, t:, :]

        normed = MaskedLayerNorm(self.in_features, name="norm")(x, embed_mask)

        # patch conv path
        patches = normed[:, t:, :].reshape(b, g, g, self.in_features)
        patches = nn.Conv(self.out_features, kernel_size=(r + 1, r + 1),
                          strides=(r, r), padding=r // 2, dtype=self.dtype,
                          kernel_init=trunc_normal_init, name="reduce")(patches)
        patches = patches.reshape(b, self.out_grid * self.out_grid, self.out_features)
        pos_embed = self.param("pos_embed", trunc_normal_init,
                               (1, self.out_grid * self.out_grid, self.out_features),
                               jnp.float32)
        patches = patches + pos_embed.astype(patches.dtype)

        # patch residual: 2x2 average pool, channel zero-pad
        pres = patches_res.reshape(b, g, g, self.in_features)
        pres = nn.avg_pool(pres, window_shape=(r, r), strides=(r, r))
        pres = pres.reshape(b, self.out_grid * self.out_grid, self.in_features)
        pres = jnp.pad(pres, ((0, 0), (0, 0), (0, pad)))

        # token path
        tokens = nn.Dense(self.out_features, dtype=self.dtype,
                          kernel_init=trunc_normal_init,
                          name="token_transform")(normed[:, :t, :])
        tres = jnp.pad(tokens_res, ((0, 0), (0, 0), (0, pad)))

        out = jnp.concatenate([tokens, patches], axis=1)
        residual = jnp.concatenate([tres, pres], axis=1)
        out = out + residual

        out = apply_mask(out, out_mask)
        return out, out_mask


class VisionTransformerSR(nn.Module):
    """Flexible (multi-stage) ViT parameterized by a ``network_def``.

    Call signature:
      ``model(x, masks=masks, deterministic=..., patch_output_type=...)``
    where ``x`` is NHWC imagery and ``masks`` is ``None`` (dense) or the
    pytree built by ``models.supernet.build_arch_masks``:
    ``{'embed': (B,1,C0)|None, 'slots': per-network_def-slot entries}``.

    Returns ``cls_logits``, ``(cls_logits, dst_logits)`` (distill token) or
    ``(cls_logits, patch_logits)`` (patch_output during training), matching
    the reference forward contract (nets/vit_sr_supernet.py:432-462).
    """

    network_def: Any                 # canonical nested tuple (hashable/static)
    img_size: int = 224
    patch_size: int = 14
    num_classes: int = 1000
    distill_token: bool = False
    patch_output: bool = False
    dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # rematerialize transformer blocks in the backward pass (trades FLOPs
    # for HBM; enables larger per-chip batches)
    remat: bool = False

    @property
    def num_tokens(self) -> int:
        return 2 if self.distill_token else 1

    def setup(self):
        net = self.network_def
        nd.validate(net)
        head_in, head_classes = nd.head_channels(net[-1])
        assert head_classes == self.num_classes

        stem = net[0]
        stem_type = nd.block_type(stem)
        embed_dim = nd.embed_channels(stem)
        if stem_type == nd.LINEAR_EMBED:
            self.patch_embed = PatchEmbed(self.img_size, self.patch_size,
                                          embed_dim, dtype=self.dtype)
        else:
            mid = nd.conv_mid_channels(stem) if stem_type == nd.FLEX_CONV_EMBED else 24
            self.patch_embed = PatchConvEmbed(self.img_size, self.patch_size,
                                              embed_dim, mid_chans=mid, dtype=self.dtype)

        grid = self.img_size // self.patch_size
        num_patches = grid * grid
        self.tokens = self.param("tokens", trunc_normal_init,
                                 (1, self.num_tokens, embed_dim), jnp.float32)
        self.pos_embed = self.param("pos_embed", trunc_normal_init,
                                    (1, num_patches + self.num_tokens, embed_dim),
                                    jnp.float32)

        depth = nd.existing_depth(net)
        dpr = np.linspace(0.0, self.drop_path_rate, depth) if depth else []

        # static_argnums=(5,): the ``deterministic`` flag (arg 0 is self)
        block_cls = nn.remat(Block, static_argnums=(5,)) if self.remat else Block
        blocks = {}
        d = 0
        for slot, block_def in enumerate(net):
            btype = nd.block_type(block_def)
            if btype == nd.TRANSFORMER:
                tdef = nd.transformer_def(block_def)
                assert tdef.embed_dim == embed_dim, f"slot {slot} width mismatch"
                if tdef.exists:
                    blocks[str(slot)] = block_cls(
                        dim=embed_dim, num_heads=tdef.num_heads,
                        head_dim=tdef.head_dim, mlp_hidden=tdef.ffn_hidden,
                        dropout_rate=self.dropout_rate,
                        attn_dropout_rate=self.attn_dropout_rate,
                        drop_path_rate=float(dpr[d]), dtype=self.dtype,
                        name=f"blocks_{slot}")
                    d += 1
                else:
                    blocks[str(slot)] = None  # bypass slot
            elif btype == nd.SPATIAL_REDUCTION:
                in_ch, out_ch = nd.sr_channels(block_def)
                assert in_ch == embed_dim, f"slot {slot}: SR input width mismatch"
                blocks[str(slot)] = SpatialReductionPatchEmbed(
                    grid=grid, in_features=in_ch, out_features=out_ch,
                    num_tokens=self.num_tokens, dtype=self.dtype,
                    name=f"blocks_{slot}")
                grid //= 2
                embed_dim = out_ch
        self._blocks = blocks
        self._final_dim = embed_dim
        assert head_in == embed_dim

        self.pos_drop = nn.Dropout(self.dropout_rate)
        self.norm = MaskedLayerNorm(embed_dim, name="norm")
        self.cls_head = nn.Dense(self.num_classes, dtype=self.dtype,
                                 kernel_init=trunc_normal_init, name="cls_head")
        if self.distill_token:
            self.dst_head = nn.Dense(self.num_classes, dtype=self.dtype,
                                     kernel_init=trunc_normal_init, name="dst_head")
        if self.patch_output:
            assert not self.distill_token, \
                "patch_output and distillation are mutually exclusive"
            self.patch_head = nn.Dense(self.num_classes, dtype=self.dtype,
                                       kernel_init=trunc_normal_init, name="patch_head")

    def forward_features(self, x: Array, masks: Optional[Dict],
                         deterministic: bool, want_patches: bool):
        b = x.shape[0]
        x = self.patch_embed(x, deterministic=deterministic)
        tokens = jnp.broadcast_to(self.tokens.astype(x.dtype),
                                  (b,) + self.tokens.shape[1:])
        x = jnp.concatenate([tokens, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)

        embed_mask = None
        layer_mask = None
        if masks is not None and masks.get("embed") is not None:
            embed_mask = masks["embed"]
            x = apply_mask(x, embed_mask)

        slot_masks = (masks or {}).get("slots", {})
        for slot, block_def in enumerate(self.network_def):
            btype = nd.block_type(block_def)
            if btype == nd.TRANSFORMER:
                block = self._blocks[str(slot)]
                if block is None:
                    layer_mask = None  # BypassBlock drops the chain
                    continue
                x, layer_mask = block(x, embed_mask, layer_mask,
                                      slot_masks.get(slot), deterministic)
            elif btype == nd.SPATIAL_REDUCTION:
                sr_mask = (slot_masks.get(slot) or {}).get("embed")
                x, embed_mask = self._blocks[str(slot)](
                    x, embed_mask, sr_mask, deterministic=deterministic)
                layer_mask = None

        if want_patches:
            x = self.norm(x, embed_mask)
            return x[:, : self.num_tokens], x[:, self.num_tokens:]
        token_features = self.norm(x[:, : self.num_tokens], embed_mask)
        return token_features, None

    def __call__(self, x: Array, masks: Optional[Dict] = None,
                 *, deterministic: bool = True,
                 patch_output_type: Optional[str] = None):
        # During init the patch branch always runs so patch_head parameters
        # are materialized even when initializing in eval mode.
        want_patches = self.patch_output and (not deterministic or self.is_initializing())
        token_features, patch_features = self.forward_features(
            x, masks, deterministic, want_patches)
        cls_pred = self.cls_head(token_features[:, 0])

        if self.patch_output:
            if want_patches:
                if patch_output_type in ("seq", None):
                    patch_pred = self.patch_head(patch_features)
                elif patch_output_type == "avg":
                    patch_pred = self.patch_head(patch_features.mean(axis=1))
                else:
                    raise ValueError(f"bad patch_output_type {patch_output_type}")
                return cls_pred, patch_pred
            return cls_pred

        if self.num_tokens == 2:
            dst_pred = self.dst_head(token_features[:, 1])
            return cls_pred, dst_pred
        return cls_pred

    def no_weight_decay_paths(self) -> Tuple[str, ...]:
        """Parameter name suffixes excluded from weight decay.

        Reference: nets/vit_sr_supernet.py:379-385 (token parameters).
        """
        return ("tokens",)
