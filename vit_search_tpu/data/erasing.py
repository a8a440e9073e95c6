"""Device-side random erasing (timm RandomErasing semantics).

The reference applies timm RandomErasing (prob 0.25, per-pixel gaussian
fill) on the host after normalization (datasets.py:110-126, defaults
main.py:150-156: ``--reprob/--remode/--recount``).  Here it runs inside the
compiled train step: per-image boxes are boolean masks from traced scalars
under ``vmap``, so shapes stay static and the op fuses with the rest of the
input processing.

Modes (timm RandomErasing ``mode``): ``pixel`` — per-pixel N(0,1) fill
(``per_pixel``), ``rand`` — one N(0,1) color per region (``rand_color``),
``const`` — zeros.  ``count`` is timm ``max_count``: the number of erased
regions is drawn uniformly from [1, count]; each region's area is an
independent fraction of the whole image (timm RandomErasing.__call__ loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_MODES = ("pixel", "rand", "const")


def random_erasing(rng: jax.Array, images: Array, prob: float = 0.25,
                   area_range=(0.02, 1 / 3), aspect_range=(0.3, 3.3),
                   mode: str = "pixel", count: int = 1) -> Array:
    """Erase up to ``count`` random boxes per image, with prob ``prob``."""
    if prob <= 0.0:
        return images
    if mode not in _MODES:
        raise ValueError(f"unknown erasing mode {mode!r}; one of {_MODES}")
    count = max(1, int(count))
    b, h, w, c = images.shape

    def erase_one(key, img):
        k_apply, k_count, k_regions = jax.random.split(key, 3)
        apply = jax.random.uniform(k_apply) < prob
        n_regions = jax.random.randint(k_count, (), 1, count + 1)

        for i, k_region in enumerate(jax.random.split(k_regions, count)):
            k_area, k_aspect, k_y, k_x, k_noise = jax.random.split(k_region, 5)
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
            if mode == "pixel":
                fill = jax.random.normal(k_noise, img.shape, img.dtype)
            elif mode == "rand":
                fill = jnp.broadcast_to(
                    jax.random.normal(k_noise, (c,), img.dtype), img.shape)
            else:
                fill = jnp.zeros_like(img)
            img = jnp.where(box[..., None] & apply & (i < n_regions),
                            fill, img)
        return img

    keys = jax.random.split(rng, b)
    return jax.vmap(erase_one)(keys, images)
