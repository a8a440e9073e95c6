"""Device-side mixup, CutMix and shifted-patch token mixup.

The reference mixes batches on the host/GPU with in-place tensor surgery
(token_mixup.py, timm ``Mixup``).  Here mixing is pure JAX executed inside
the compiled train step: boxes become boolean grid masks compared against
traced scalars, so shapes stay static and the whole augmentation fuses into
the forward program — no host round-trip per batch.

``switch_token_mix`` reproduces token_mixup.py:147-162: the first half of
the batch gets patch-aligned CutMix with per-patch one-hot targets, the
second half gets image-level mixup with replicated patch targets; the
patch-prediction mode is always ``'seq'``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def one_hot_smooth(labels: Array, num_classes: int, smoothing: float = 0.0) -> Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * (on - off) + off


def mixup_targets(labels: Array, perm: Array, lam: Array, num_classes: int,
                  smoothing: float) -> Array:
    y = one_hot_smooth(labels, num_classes, smoothing)
    return y * lam + y[perm] * (1.0 - lam)


def _rand_box(rng: jax.Array, grid: int, lam: Array) -> Tuple[Array, Array, Array, Array, Array]:
    """Random patch-aligned box covering ~``(1-lam)`` of the grid.

    Returns (y0, x0, h, w, realized_lam); reproduces the reference box
    generator semantics (token_mixup.py:75-98) with traced scalars.
    """
    k_h, k_y, k_x = jax.random.split(rng, 3)
    area = (grid * grid * lam).astype(jnp.int32)
    max_len = jnp.minimum(grid, area)

    def randint(key, low, high):
        high = jnp.where(high <= low, low + 1, high)
        return jax.random.randint(key, (), low, high)

    h = randint(k_h, 1, jnp.maximum(1, max_len - 1))
    w = area // h
    too_wide = w > grid
    w = jnp.where(too_wide, grid, w)
    h = jnp.where(too_wide, area // jnp.maximum(w, 1), h)
    y0 = randint(k_y, 0, jnp.maximum(0, grid - h))
    x0 = randint(k_x, 0, jnp.maximum(0, grid - w))
    realized = 1.0 - (h * w).astype(jnp.float32) / (grid * grid)
    return y0, x0, h, w, realized


def patch_mixup(rng: jax.Array, samples: Array, labels: Array, grid: int,
                num_classes: int, smoothing: float = 0.1):
    """Patch-aligned CutMix with per-patch targets (token_mixup.py:110-126)."""
    b, img_h, img_w, c = samples.shape
    patch = img_h // grid
    k_perm, k_lam, k_box = jax.random.split(rng, 3)
    perm = jax.random.permutation(k_perm, b)
    lam0 = jax.random.beta(k_lam, 1.0, 1.0)
    y0, x0, h, w, lam = _rand_box(k_box, grid, lam0)

    gy = jax.lax.broadcasted_iota(jnp.int32, (grid, grid), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (grid, grid), 1)
    box = ((gy >= y0) & (gy < y0 + h) & (gx >= x0) & (gx < x0 + w))

    pix = jnp.repeat(jnp.repeat(box, patch, axis=0), patch, axis=1)
    mixed = jnp.where(pix[None, :, :, None], samples[perm], samples)

    onehot = one_hot_smooth(labels, num_classes, smoothing)
    grid_targets = jnp.broadcast_to(onehot[:, None, None, :],
                                    (b, grid, grid, num_classes))
    patch_targets = jnp.where(box[None, :, :, None], grid_targets[perm], grid_targets)
    patch_targets = patch_targets.reshape(b, grid * grid, num_classes)

    targets = onehot * lam + onehot[perm] * (1.0 - lam)
    return mixed, targets, patch_targets


def image_mixup(rng: jax.Array, samples: Array, labels: Array, grid: int,
                num_classes: int, smoothing: float = 0.1, alpha: float = 0.8):
    """Image-level mixup with replicated patch targets (token_mixup.py:129-144)."""
    b = samples.shape[0]
    k_perm, k_lam = jax.random.split(rng)
    perm = jax.random.permutation(k_perm, b)
    lam = jax.random.beta(k_lam, alpha, alpha)
    mixed = samples * lam + samples[perm] * (1.0 - lam)
    targets = mixup_targets(labels, perm, lam, num_classes, smoothing)
    patch_targets = jnp.broadcast_to(targets[:, None, :],
                                     (b, grid * grid, num_classes))
    return mixed, targets, patch_targets


def switch_token_mix(rng: jax.Array, samples: Array, labels: Array, grid: int,
                     num_classes: int, smoothing: float = 0.1):
    """Half-batch patch CutMix + half-batch image mixup ('seq' mode)."""
    b = samples.shape[0]
    assert b % 2 == 0, "switch_token_mix needs an even batch"
    k1, k2 = jax.random.split(rng)
    half = b // 2
    s1, t1, p1 = patch_mixup(k1, samples[:half], labels[:half], grid,
                             num_classes, smoothing)
    s2, t2, p2 = image_mixup(k2, samples[half:], labels[half:], grid,
                             num_classes, smoothing)
    return (jnp.concatenate([s1, s2]), jnp.concatenate([t1, t2]),
            jnp.concatenate([p1, p2]))


def mixup_cutmix(rng: jax.Array, samples: Array, labels: Array, num_classes: int,
                 mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 switch_prob: float = 0.5, smoothing: float = 0.1,
                 mixup_prob: float = 1.0):
    """timm-style batchwise Mixup/CutMix switcher (datasets via main.py:308-316).

    One draw decides mixup vs cutmix for the whole batch (timm
    ``mode='batch'``); ``mixup_prob`` gates whether any mixing happens at all
    (timm ``prob``; 1.0 in every published recipe).
    """
    b, img_h, img_w, _ = samples.shape
    k_apply, k_switch, k_perm, k_mix, k_cut, k_box = jax.random.split(rng, 6)
    perm = jax.random.permutation(k_perm, b)
    use_cutmix = jax.random.uniform(k_switch) < switch_prob

    lam_mix = jax.random.beta(k_mix, mixup_alpha, mixup_alpha)
    mixed_mix = samples * lam_mix + samples[perm] * (1.0 - lam_mix)

    lam_cut0 = jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha)
    # standard cutmix box: ratio sqrt(1-lam), centered uniformly (clipped)
    cut_rat = jnp.sqrt(1.0 - lam_cut0)
    ch = (img_h * cut_rat).astype(jnp.int32)
    cw = (img_w * cut_rat).astype(jnp.int32)
    k_cy, k_cx = jax.random.split(k_box)
    cy = jax.random.randint(k_cy, (), 0, img_h)
    cx = jax.random.randint(k_cx, (), 0, img_w)
    y0 = jnp.clip(cy - ch // 2, 0, img_h)
    y1 = jnp.clip(cy + ch // 2, 0, img_h)
    x0 = jnp.clip(cx - cw // 2, 0, img_w)
    x1 = jnp.clip(cx + cw // 2, 0, img_w)
    iy = jax.lax.broadcasted_iota(jnp.int32, (img_h, img_w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (img_h, img_w), 1)
    box = ((iy >= y0) & (iy < y1) & (ix >= x0) & (ix < x1))
    mixed_cut = jnp.where(box[None, :, :, None], samples[perm], samples)
    lam_cut = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (img_h * img_w)

    mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_cut, lam_mix)
    if mixup_prob < 1.0:
        apply = jax.random.uniform(k_apply) < mixup_prob
        mixed = jnp.where(apply, mixed, samples)
        lam = jnp.where(apply, lam, 1.0)
    targets = mixup_targets(labels, perm, lam, num_classes, smoothing)
    return mixed, targets
