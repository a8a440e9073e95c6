"""Patch embedding stems.

- :class:`PatchEmbed` — linear patchify (network_def type 0).  Implemented as
  reshape + matmul rather than a strided conv so XLA maps it straight onto
  the MXU (a kernel==stride conv is the same computation).
- :class:`PatchConvEmbed` — convolutional stem (types 4/5): stride-2
  Conv-BN-ReLU, a two-conv residual body, then a (patch/2)-strided projection.
  Reference: nets/patch_conv.py:23-73.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import trunc_normal_init

Array = jnp.ndarray


class PatchEmbed(nn.Module):
    """Linear patch embedding over an ``(B, H, W, 3)`` image (NHWC)."""

    img_size: int
    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        b, h, w, c = x.shape
        p, g = self.patch_size, self.grid
        assert h == self.img_size and w == self.img_size, (h, w, self.img_size)
        x = x.reshape(b, g, p, g, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * c)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="proj")(x)
        return x


class ConvBnAct(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.Conv(self.features, kernel_size=(3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype, name="conv")(x)
        # BN compute follows the model dtype: at 112px the stem activations
        # dominate HBM traffic and an f32 BN materializes f32 copies of them
        # (2x bytes).  Stats/params stay f32 (param_dtype default; TPU bf16
        # reductions accumulate in f32), matching torch-AMP semantics.
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class PatchConvEmbed(nn.Module):
    """Convolutional patch stem (network_def types 4/5)."""

    img_size: int
    patch_size: int
    embed_dim: int
    mid_chans: int = 24
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        assert self.patch_size % 2 == 0
        b = x.shape[0]
        x = ConvBnAct(self.mid_chans, strides=2, dtype=self.dtype, name="conv1")(
            x, deterministic=deterministic)
        res = x
        x = ConvBnAct(self.mid_chans, dtype=self.dtype, name="conv2")(
            x, deterministic=deterministic)
        x = ConvBnAct(self.mid_chans, dtype=self.dtype, name="conv3")(
            x, deterministic=deterministic)
        x = x + res
        half = self.patch_size // 2
        x = nn.Conv(self.embed_dim, kernel_size=(half, half), strides=(half, half),
                    dtype=self.dtype, kernel_init=trunc_normal_init, name="proj")(x)
        return x.reshape(b, self.num_patches, self.embed_dim)
