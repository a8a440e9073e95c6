"""Optimizer and LR schedule factories (optax).

Parity targets:
- AdamW, base lr 5e-4 scaled linearly by ``global_batch / 512``
  (reference main.py:113,383-384), betas/eps at torch AdamW defaults,
  weight decay 0.05 (main.py:111);
- cosine decay to ``min_lr`` with linear warmup from ``warmup_lr`` over
  ``warmup_epochs`` (timm ``create_scheduler`` defaults; main.py:107-128);
- weight decay skips 1-D parameters (norm scales/biases, biases) and the
  class/distill token table, matching timm's ``add_weight_decay`` driven by
  ``model.no_weight_decay()`` (reference nets/vit_sr_supernet.py:379-385);
- optional global-norm gradient clipping (``--clip-grad``, main.py:99).

The schedule is per-step (TPU steps are the natural unit) but follows the
reference's per-epoch curve exactly at epoch boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    base_lr: float = 5e-4
    min_lr: float = 1e-5
    warmup_lr: float = 1e-6
    warmup_epochs: int = 5
    epochs: int = 300
    weight_decay: float = 0.05
    clip_grad: Optional[float] = None
    global_batch_size: int = 1024
    lr_scale_divisor: int = 512     # lr = base_lr * global_batch / 512
    steps_per_epoch: int = 1
    beta1: float = 0.9              # --opt-betas
    beta2: float = 0.999
    eps: float = 1e-8               # --opt-eps

    @property
    def scaled_lr(self) -> float:
        return self.base_lr * self.global_batch_size / self.lr_scale_divisor


def cosine_schedule(config: OptimConfig) -> optax.Schedule:
    warmup_steps = config.warmup_epochs * config.steps_per_epoch
    total_steps = config.epochs * config.steps_per_epoch
    decay_steps = max(1, total_steps - warmup_steps)
    peak = config.scaled_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = config.warmup_lr + (peak - config.warmup_lr) * (
            step / jnp.maximum(1.0, warmup_steps))
        progress = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = config.min_lr + 0.5 * (peak - config.min_lr) * (
            1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def weight_decay_mask(params: Any) -> Any:
    """True (decay) for rank>=2 weights except the token table."""
    def mask_leaf(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "tokens":
            return False
        return jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_optimizer(config: OptimConfig, params: Any) -> optax.GradientTransformation:
    schedule = cosine_schedule(config)
    tx = optax.adamw(schedule, b1=config.beta1, b2=config.beta2, eps=config.eps,
                     weight_decay=config.weight_decay,
                     mask=weight_decay_mask(params))
    if config.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad), tx)
    return tx
