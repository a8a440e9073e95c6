"""Device-side random erasing (timm 'pixel' mode).

The reference applies timm RandomErasing (prob 0.25, per-pixel gaussian
fill) on the host after normalization (datasets.py:110-126, defaults
main.py:150-156).  Here it runs inside the compiled train step: per-image
boxes are boolean masks from traced scalars under ``vmap``, so shapes stay
static and the op fuses with the rest of the input processing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def random_erasing(rng: jax.Array, images: Array, prob: float = 0.25,
                   area_range=(0.02, 1 / 3), aspect_range=(0.3, 3.3)) -> Array:
    """Erase one random box per image with gaussian noise, with prob ``prob``."""
    if prob <= 0.0:
        return images
    b, h, w, c = images.shape

    def erase_one(key, img):
        k_apply, k_area, k_aspect, k_y, k_x, k_noise = jax.random.split(key, 6)
        apply = jax.random.uniform(k_apply) < prob
        area = jax.random.uniform(k_area, minval=area_range[0],
                                  maxval=area_range[1]) * (h * w)
        log_aspect = jax.random.uniform(
            k_aspect, minval=jnp.log(aspect_range[0]),
            maxval=jnp.log(aspect_range[1]))
        aspect = jnp.exp(log_aspect)
        eh = jnp.clip(jnp.sqrt(area * aspect).astype(jnp.int32), 1, h)
        ew = jnp.clip(jnp.sqrt(area / aspect).astype(jnp.int32), 1, w)
        y0 = jax.random.randint(k_y, (), 0, jnp.maximum(1, h - eh + 1))
        x0 = jax.random.randint(k_x, (), 0, jnp.maximum(1, w - ew + 1))
        iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        box = (iy >= y0) & (iy < y0 + eh) & (ix >= x0) & (ix < x0 + ew)
        noise = jax.random.normal(k_noise, img.shape, img.dtype)
        return jnp.where((box[..., None] & apply), noise, img)

    keys = jax.random.split(rng, b)
    return jax.vmap(erase_one)(keys, images)
