"""Model registry: name -> flax module factory.

Plays the role of the timm registry in the reference (every network is
exposed via ``@register_model`` factories consumed through
``timm.models.create_model``; reference: nets/vit_sr_supernet.py:480-577,
nets/vision_transformer_supernet.py:236-284, models.py:15-57,
nets/data_efficient_image_transformer.py:119-151, nets/regnet_upsample.py:34).
Every reference model name resolves here to a module with the same
architecture semantics.

``*_supernet`` names build the same module as their base name — supernet
training is a property of the masks fed at call time, not of the module —
but are registered so reference CLI invocations work unchanged; the trainer
keys off the name suffix to construct sampling schedules.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax.numpy as jnp

from ..arch import presets
from ..arch.presets import flat_vit_def
from .vit_sr import VisionTransformerSR

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(fn: Callable[..., Any]) -> Callable[..., Any]:
    _REGISTRY[fn.__name__] = fn
    return fn


def is_supernet_model(name: str) -> bool:
    return name.endswith("_supernet")


def available_models() -> List[str]:
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs) -> Any:
    """Instantiate a registered model (timm ``create_model`` equivalent)."""
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; available: {available_models()}") from None
    return factory(**kwargs)


def _vit_sr(default_img_size: int, distill_token: bool, patch_output: bool, **kwargs):
    kwargs.setdefault("img_size", default_img_size)
    kwargs.setdefault("network_def", presets.VIT_RES_TINY)
    kwargs.setdefault("num_classes", kwargs["network_def"][-1][2])
    kwargs.setdefault("dtype", jnp.float32)
    return VisionTransformerSR(patch_size=14, distill_token=distill_token,
                               patch_output=patch_output, **kwargs)


# --- ViT-SR family (patch 14) -------------------------------------------------

@register_model
def flexible_vit_sr_distill_patch14_224(**kwargs):
    return _vit_sr(224, distill_token=True, patch_output=False, **kwargs)


@register_model
def flexible_vit_sr_patch14_224(**kwargs):
    return _vit_sr(224, distill_token=False, patch_output=False, **kwargs)


@register_model
def flexible_vit_sr_patch14_224_patch_output(**kwargs):
    return _vit_sr(224, distill_token=False, patch_output=True, **kwargs)


@register_model
def flexible_vit_sr_distill_patch14_224_supernet(**kwargs):
    return _vit_sr(224, distill_token=True, patch_output=False, **kwargs)


@register_model
def flexible_vit_sr_patch14_224_supernet(**kwargs):
    return _vit_sr(224, distill_token=False, patch_output=False, **kwargs)


@register_model
def flexible_vit_sr_patch14_224_patch_output_supernet(**kwargs):
    return _vit_sr(224, distill_token=False, patch_output=True, **kwargs)


@register_model
def flexible_vit_sr_patch14_280_patch_output(**kwargs):
    return _vit_sr(280, distill_token=False, patch_output=True, **kwargs)


@register_model
def flexible_vit_sr_patch14_336_patch_output(**kwargs):
    return _vit_sr(336, distill_token=False, patch_output=True, **kwargs)


@register_model
def flexible_vit_sr_patch14_392_patch_output(**kwargs):
    return _vit_sr(392, distill_token=False, patch_output=True, **kwargs)


# --- Flexible flat ViTs (patch 16) ----------------------------------------------

def _vit_flat(default_img_size: int, **kwargs):
    kwargs.setdefault("img_size", default_img_size)
    kwargs.setdefault("network_def", presets.VIT_TINY)
    kwargs.setdefault("num_classes", kwargs["network_def"][-1][2])
    return VisionTransformerSR(patch_size=16,
                               distill_token=kwargs.pop("distill_token", True),
                               patch_output=False, **kwargs)


@register_model
def flexible_vit_patch16_224(**kwargs):
    return _vit_flat(224, **kwargs)


@register_model
def flexible_vit_patch16_224_supernet(**kwargs):
    return _vit_flat(224, **kwargs)


@register_model
def flexible_vit_patch16_192(**kwargs):
    return _vit_flat(192, **kwargs)


@register_model
def flexible_vit_patch16_192_supernet(**kwargs):
    return _vit_flat(192, **kwargs)


# --- Stock DeiT (models.py) and distill variants ---------------------------------

def _deit(embed_dim: int, num_heads: int, distill_token: bool, **kwargs):
    depth = kwargs.pop("depth", 12)
    kwargs.pop("network_def", None)
    net = flat_vit_def(embed_dim, num_heads, embed_dim // num_heads,
                       embed_dim * 4, depth,
                       num_classes=kwargs.get("num_classes", 1000))
    return VisionTransformerSR(network_def=net, img_size=kwargs.pop("img_size", 224),
                               patch_size=16, distill_token=distill_token, **kwargs)


@register_model
def deit_tiny_patch16_224(**kwargs):
    return _deit(192, 3, distill_token=False, **kwargs)


@register_model
def deit_small_patch16_224(**kwargs):
    return _deit(384, 6, distill_token=False, **kwargs)


@register_model
def deit_base_patch16_224(**kwargs):
    return _deit(768, 12, distill_token=False, **kwargs)


@register_model
def deit_tiny_distill_patch16_224(**kwargs):
    return _deit(192, 3, distill_token=True, **kwargs)


@register_model
def deit_tiny_133X_distill_patch16_224(**kwargs):
    return _deit(256, 4, distill_token=True, **kwargs)


@register_model
def deit_tiny_167X_distill_patch16_224(**kwargs):
    return _deit(320, 5, distill_token=True, **kwargs)


@register_model
def deit_small_distill_patch16_224(**kwargs):
    return _deit(384, 6, distill_token=True, **kwargs)


# --- Teacher ----------------------------------------------------------------------

@register_model
def regnety_160_upsample(**kwargs):
    from .regnet import RegNetYUpsample
    return RegNetYUpsample(**kwargs)
