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


def _sample_mix_params(rng: jax.Array, shape, mixup_alpha: float,
                       cutmix_alpha: float, switch_prob: float,
                       mixup_prob: float):
    """timm ``Mixup._params_per_elem``/``_params`` with explicit keys.

    Returns (lam, use_cutmix) of the given shape; ``lam == 1`` disables
    mixing for that draw (the ``prob`` gate).
    """
    k_switch, k_mix, k_cut, k_apply = jax.random.split(rng, 4)
    if mixup_alpha > 0.0 and cutmix_alpha > 0.0:
        use_cutmix = jax.random.uniform(k_switch, shape) < switch_prob
        lam_mix = jnp.where(
            use_cutmix,
            jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha, shape),
            jax.random.beta(k_mix, mixup_alpha, mixup_alpha, shape))
    elif mixup_alpha > 0.0:
        use_cutmix = jnp.zeros(shape, bool)
        lam_mix = jax.random.beta(k_mix, mixup_alpha, mixup_alpha, shape)
    elif cutmix_alpha > 0.0:
        use_cutmix = jnp.ones(shape, bool)
        lam_mix = jax.random.beta(k_cut, cutmix_alpha, cutmix_alpha, shape)
    else:
        raise ValueError("one of mixup_alpha/cutmix_alpha must be > 0")
    apply = jax.random.uniform(k_apply, shape) < mixup_prob
    return jnp.where(apply, lam_mix, 1.0), use_cutmix


def _cutmix_box(rng: jax.Array, img_h: int, img_w: int, lam: Array,
                cutmix_minmax=None):
    """timm ``cutmix_bbox_and_lam`` (correct_lam=True): returns a boolean
    (H, W) mask and the realized lam.

    Default: box side ratio sqrt(1-lam), center uniform, clipped at the
    borders (``rand_bbox``).  With ``cutmix_minmax=(lo, hi)``: height and
    width sampled independently as uniform fractions in [lo, hi], box fully
    inside the image (``rand_bbox_minmax``), lam ignored on input.
    """
    k_a, k_b, k_c, k_d = jax.random.split(rng, 4)
    if cutmix_minmax is not None:
        lo, hi = cutmix_minmax
        ch = jax.random.randint(k_a, (), int(img_h * lo), int(img_h * hi))
        cw = jax.random.randint(k_b, (), int(img_w * lo), int(img_w * hi))
        y0 = jax.random.randint(k_c, (), 0, img_h - ch)
        x0 = jax.random.randint(k_d, (), 0, img_w - cw)
        y1, x1 = y0 + ch, x0 + cw
    else:
        cut_rat = jnp.sqrt(1.0 - lam)
        ch = (img_h * cut_rat).astype(jnp.int32)
        cw = (img_w * cut_rat).astype(jnp.int32)
        cy = jax.random.randint(k_a, (), 0, img_h)
        cx = jax.random.randint(k_b, (), 0, img_w)
        y0 = jnp.clip(cy - ch // 2, 0, img_h)
        y1 = jnp.clip(cy + ch // 2, 0, img_h)
        x0 = jnp.clip(cx - cw // 2, 0, img_w)
        x1 = jnp.clip(cx + cw // 2, 0, img_w)
    iy = jax.lax.broadcasted_iota(jnp.int32, (img_h, img_w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (img_h, img_w), 1)
    box = ((iy >= y0) & (iy < y1) & (ix >= x0) & (ix < x1))
    realized = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (img_h * img_w)
    return box, realized


def mixup_cutmix(rng: jax.Array, samples: Array, labels: Array, num_classes: int,
                 mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 switch_prob: float = 0.5, smoothing: float = 0.1,
                 mixup_prob: float = 1.0, mode: str = "batch",
                 cutmix_minmax=None):
    """timm ``Mixup`` (reference main.py:150-160 via datasets) in pure JAX.

    Mixing partner is the flipped batch (timm ``x.flip(0)``).  Modes:
    ``batch`` — one lam + one mixup/cutmix decision for the whole batch;
    ``elem`` — per-example lam/decision/box; ``pair`` — per-pair params for
    (i, b-1-i), applied symmetrically (both elements share lam and box).
    ``cutmix_minmax`` switches the box sampler to ``rand_bbox_minmax``.
    """
    if mode not in ("batch", "elem", "pair"):
        raise ValueError(f"unknown mixup mode {mode!r}")
    b, img_h, img_w, _ = samples.shape
    if mode == "pair" and b % 2:
        raise ValueError("pair mode needs an even batch (timm asserts this)")
    if cutmix_minmax is not None:
        if len(cutmix_minmax) != 2:
            raise ValueError("cutmix_minmax must be (lo, hi)")
        cutmix_alpha = 1.0  # timm Mixup: minmax overrides alpha, enables cutmix
    flipped = samples[::-1]
    k_params, k_box = jax.random.split(rng)

    if mode == "batch":
        lam0, use_cutmix = _sample_mix_params(
            k_params, (), mixup_alpha, cutmix_alpha, switch_prob, mixup_prob)
        box, lam_cut = _cutmix_box(k_box, img_h, img_w, lam0, cutmix_minmax)
        lam = jnp.where(use_cutmix, jnp.where(lam0 == 1.0, 1.0, lam_cut), lam0)
        mixed_cut = jnp.where((box[None, :, :, None]) & use_cutmix
                              & (lam0 != 1.0), flipped, samples)
        mixed_mix = samples * lam + flipped * (1.0 - lam)
        mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    else:
        half = b // 2
        n = half if mode == "pair" else b
        lam0, use_cutmix = _sample_mix_params(
            k_params, (n,), mixup_alpha, cutmix_alpha, switch_prob, mixup_prob)
        box_keys = jax.random.split(k_box, n)
        boxes, lam_cut = jax.vmap(
            lambda k, l: _cutmix_box(k, img_h, img_w, l, cutmix_minmax)
        )(box_keys, lam0)
        if mode == "pair":
            # mirror pair params onto the second half (timm _mix_pair)
            lam0 = jnp.concatenate([lam0, lam0[::-1]])
            use_cutmix = jnp.concatenate([use_cutmix, use_cutmix[::-1]])
            boxes = jnp.concatenate([boxes, boxes[::-1]])
            lam_cut = jnp.concatenate([lam_cut, lam_cut[::-1]])
        lam = jnp.where(use_cutmix, jnp.where(lam0 == 1.0, 1.0, lam_cut), lam0)
        active = use_cutmix & (lam0 != 1.0)
        mixed_cut = jnp.where(boxes[:, :, :, None]
                              & active[:, None, None, None], flipped, samples)
        lam_col = lam[:, None, None, None]
        mixed_mix = samples * lam_col + flipped * (1.0 - lam_col)
        mixed = jnp.where(use_cutmix[:, None, None, None], mixed_cut, mixed_mix)

    y = one_hot_smooth(labels, num_classes, smoothing)
    lam_t = lam if jnp.ndim(lam) == 0 else lam[:, None]
    targets = y * lam_t + y[::-1] * (1.0 - lam_t)
    return mixed, targets
