"""RegNetY teacher network for knowledge distillation.

Plays the role of the reference's timm-based ``RegNetY160Upsample`` wrapper
(nets/regnet_upsample.py:10-39): inputs are bicubic-resized to 224px before
the forward pass so the teacher can score higher/lower-resolution student
batches.  RegNetY-16GF configuration (stage widths 224/448/1232/3024, depths
2/4/11/1, group width 112, SE ratio 0.25) per "Designing Network Design
Spaces" (Radosavovic et al., 2020); pretrained weights can be loaded from a
converted checkpoint via ``train.checkpoint``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides,) * 2, padding=self.kernel // 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x) if self.act else x


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s))
        return x * s


class YBlock(nn.Module):
    """RegNetY bottleneck block (b=1) with SE."""

    features: int
    strides: int
    group_width: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        in_features = x.shape[-1]
        groups = self.features // self.group_width
        out = ConvBN(self.features, kernel=1, dtype=self.dtype, name="a")(
            x, deterministic=deterministic)
        out = ConvBN(self.features, kernel=3, strides=self.strides, groups=groups,
                     dtype=self.dtype, name="b")(out, deterministic=deterministic)
        out = SqueezeExcite(max(1, int(in_features * self.se_ratio)),
                            dtype=self.dtype, name="se")(out)
        out = ConvBN(self.features, kernel=1, act=False, dtype=self.dtype, name="c")(
            out, deterministic=deterministic)
        if self.strides != 1 or in_features != self.features:
            x = ConvBN(self.features, kernel=1, strides=self.strides, act=False,
                       dtype=self.dtype, name="proj")(x, deterministic=deterministic)
        return nn.relu(out + x)


class RegNetY(nn.Module):
    widths: Sequence[int] = (224, 448, 1232, 3024)   # RegNetY-16GF
    depths: Sequence[int] = (2, 4, 11, 1)
    group_width: int = 112
    stem_width: int = 32
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = ConvBN(self.stem_width, kernel=3, strides=2, dtype=self.dtype,
                   name="stem")(x, deterministic=deterministic)
        for si, (w, d) in enumerate(zip(self.widths, self.depths)):
            for bi in range(d):
                x = YBlock(w, strides=2 if bi == 0 else 1,
                           group_width=self.group_width, dtype=self.dtype,
                           name=f"s{si}_b{bi}")(x, deterministic=deterministic)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class RegNetYUpsample(nn.Module):
    """Bicubic-resize inputs to ``target_size`` then run RegNetY.

    Reference: nets/regnet_upsample.py:16-31.
    """

    target_size: int = 224
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        b, h, w, c = x.shape
        if (h, w) != (self.target_size, self.target_size):
            x = jax.image.resize(
                x, (b, self.target_size, self.target_size, c), method="bicubic")
        return RegNetY(num_classes=self.num_classes, dtype=self.dtype,
                       name="regnet")(x, deterministic=deterministic)
