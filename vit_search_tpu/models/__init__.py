"""Model layer: masked ViT-SR family, supernet sampling, registry, surgery."""

from . import layers, patch_embed, registry, supernet, surgery, vit_sr
from .registry import available_models, create_model, is_supernet_model, register_model
from .supernet import SupernetSchedules, build_arch_masks
from .surgery import (interpolate_pos_embeds, rewire_params,
                      slice_subnet_params)
from .vit_sr import SpatialReductionPatchEmbed, VisionTransformerSR

__all__ = [
    "SpatialReductionPatchEmbed",
    "SupernetSchedules",
    "VisionTransformerSR",
    "available_models",
    "build_arch_masks",
    "create_model",
    "interpolate_pos_embeds",
    "is_supernet_model",
    "layers",
    "patch_embed",
    "register_model",
    "registry",
    "rewire_params",
    "slice_subnet_params",
    "supernet",
    "surgery",
    "vit_sr",
]
