"""Optimizer and LR schedule factories (optax).

Parity targets:
- AdamW, base lr 5e-4 scaled linearly by ``global_batch / 512``
  (reference main.py:113,383-384), betas/eps at torch AdamW defaults,
  weight decay 0.05 (main.py:111);
- the exact per-epoch LR curve of timm 0.3.2's ``CosineLRScheduler`` as the
  reference drives it (``create_scheduler`` main.py:388, ``step(epoch)`` at
  the top of every epoch main.py:462): linear warmup from ``warmup_lr``
  over ``warmup_epochs``, then ``min_lr + 0.5*(peak-min_lr)*(1+cos(pi *
  epoch / epochs))`` — the cosine spans the FULL ``t_initial`` including
  the warmup region (timm does not subtract warmup), LR is constant within
  an epoch, and epochs past the single cycle sit at ``min_lr``.  Optional
  ``--lr-noise`` multiplicative noise uses a torch generator seeded
  ``seed + epoch`` exactly like timm's ``Scheduler._add_noise``.
  Note ``--cooldown-epochs`` is inert in the reference too: main.py:388
  discards ``create_scheduler``'s adjusted epoch count and the train loop
  runs ``range(args.epochs)`` (main.py:460);
- weight decay skips 1-D parameters (norm scales/biases, biases) and the
  class/distill token table, matching timm's ``add_weight_decay`` driven by
  ``model.no_weight_decay()`` (reference nets/vit_sr_supernet.py:379-385);
- optional global-norm gradient clipping (``--clip-grad``, main.py:99).

The schedule is per-step (TPU steps are the natural unit) but follows the
reference's per-epoch curve exactly at epoch boundaries.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
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
    # --lr-noise [pct] or [on_pct, off_pct] (fractions of total epochs);
    # None disables noise (reference default, main.py:115-120).
    lr_noise: Optional[Union[float, Sequence[float]]] = None
    lr_noise_pct: float = 0.67
    lr_noise_std: float = 1.0       # stored-but-unused, same quirk as timm 0.3.2
    seed: int = 0                   # timm noise_seed = args.seed
    # Parsed for parity only: the reference discards create_scheduler's
    # cooldown-adjusted epoch count (main.py:388) so cooldown never runs.
    cooldown_epochs: int = 10
    # --sched: 'cosine' (every published recipe), 'step', 'tanh'.  timm
    # 0.3.2 create_scheduler additionally offers 'plateau', which is
    # metric-driven (stateful on val loss) and unsupported here — it
    # raises loudly instead of silently training with cosine.
    sched: str = "cosine"
    decay_epochs: float = 30.0      # --decay-epochs (step schedule period)
    decay_rate: float = 0.1         # --decay-rate

    @property
    def scaled_lr(self) -> float:
        return self.base_lr * self.global_batch_size / self.lr_scale_divisor


def timm_epoch_lrs(config: OptimConfig) -> np.ndarray:
    """Per-epoch LRs identical to timm 0.3.2's schedulers as the reference
    drives them (``create_scheduler`` main.py:388, ``step(epoch)`` at the
    top of every epoch main.py:460-462).

    ``config.sched`` selects the curve:

    - ``cosine`` — ``CosineLRScheduler`` with ``t_initial = epochs``,
      ``t_mul = 1``, ``cycle_limit = 1``, ``warmup_prefix = False``
      (reference main.py:110-131,388); the cosine spans the full range
      including the warmup epochs.
    - ``step`` — ``StepLRScheduler``: ``peak * decay_rate ** (t //
      decay_epochs)`` after warmup (timm 0.3.2 step_lr.py; no min_lr
      clamp in that scheduler).
    - ``tanh`` — ``TanhLRScheduler`` with the 0.3.2 defaults ``lb = -6``,
      ``ub = 4``: ``min_lr + 0.5*(peak-min_lr)*(1 - tanh(lb*(1-tr) +
      ub*tr))`` with ``tr = t/epochs``.

    Any other value (incl. timm's metric-driven ``plateau``) raises.
    Returns one value per training epoch (``range(args.epochs)``).
    """
    peak = float(config.scaled_lr)
    epochs = max(1, int(config.epochs))
    warmup_t = int(config.warmup_epochs)
    sched = config.sched
    if sched not in ("cosine", "step", "tanh"):
        raise ValueError(
            f"--sched {sched!r} is not implemented (supported: cosine, "
            f"step, tanh; timm's 'plateau' is metric-driven and has no "
            f"counterpart here). Refusing to silently train with cosine.")
    if sched == "step" and not config.decay_epochs > 0:
        raise ValueError(
            f"--decay-epochs must be > 0 for --sched step "
            f"(got {config.decay_epochs})")
    lrs = np.empty((epochs,), np.float64)
    for t in range(epochs):
        if warmup_t and t < warmup_t:
            lrs[t] = config.warmup_lr + t * (peak - config.warmup_lr) / warmup_t
        elif sched == "cosine":  # i = t // t_initial == 0 < cycle_limit
            lrs[t] = config.min_lr + 0.5 * (peak - config.min_lr) * (
                1.0 + math.cos(math.pi * t / epochs))
        elif sched == "step":
            lrs[t] = peak * config.decay_rate ** (t // config.decay_epochs)
        else:  # tanh
            tr = t / epochs
            lrs[t] = config.min_lr + 0.5 * (peak - config.min_lr) * (
                1.0 - math.tanh(-6.0 * (1.0 - tr) + 4.0 * tr))
    if config.lr_noise is not None:
        lrs = _apply_timm_lr_noise(lrs, config)
    return lrs


def _apply_timm_lr_noise(lrs: np.ndarray, config: OptimConfig) -> np.ndarray:
    """timm 0.3.2 ``Scheduler._add_noise``: per-epoch multiplicative noise
    from ``torch.Generator().manual_seed(seed + t)``, resampled until
    ``|n| < noise_pct``.  Uses torch (installed) for bit-exact parity."""
    import torch

    noise = config.lr_noise
    epochs = len(lrs)
    if isinstance(noise, (list, tuple)):
        rng = [float(n) * epochs for n in noise]
        if len(rng) == 1:
            rng = rng[0]
    else:
        rng = float(noise) * epochs
    out = lrs.copy()
    for t in range(epochs):
        if isinstance(rng, list):
            apply = rng[0] <= t < rng[1]
        else:
            apply = t >= rng
        if not apply:
            continue
        g = torch.Generator()
        g.manual_seed(config.seed + t)
        while True:
            n = torch.randn(1, generator=g).item()
            if abs(n) < config.lr_noise_pct:
                break
        out[t] = out[t] + out[t] * n
    return out


def lr_schedule(config: OptimConfig) -> optax.Schedule:
    """Per-step schedule: the timm per-epoch value (``config.sched``
    curve), constant within an epoch (the reference steps the scheduler
    once per epoch, main.py:462)."""
    lrs = jnp.asarray(timm_epoch_lrs(config), jnp.float32)
    spe = max(1, int(config.steps_per_epoch))
    last = len(lrs) - 1

    def schedule(step):
        epoch = jnp.clip(jnp.asarray(step) // spe, 0, last)
        return lrs[epoch]

    return schedule


# Historical name from when only the cosine curve existed.
cosine_schedule = lr_schedule


def weight_decay_mask(params: Any) -> Any:
    """True (decay) for rank>=2 weights except the token table."""
    def mask_leaf(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "tokens":
            return False
        return jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_optimizer(config: OptimConfig, params: Any) -> optax.GradientTransformation:
    schedule = lr_schedule(config)
    tx = optax.adamw(schedule, b1=config.beta1, b2=config.beta2, eps=config.eps,
                     weight_decay=config.weight_decay,
                     mask=weight_decay_mask(params))
    if config.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad), tx)
    return tx
