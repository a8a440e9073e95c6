"""Training layer: losses, optimizer, steps, state, checkpointing."""

from . import checkpoint, engine, losses, optim, state
from .checkpoint import (CheckpointManager, restore_raw,
                         unpack_checkpoint_archive)
from .engine import (TrainConfig, make_eval_step,
                     make_per_example_correct_step, make_train_step)
from .losses import (cross_entropy, distillation_loss,
                     label_smoothing_cross_entropy, soft_target_cross_entropy,
                     top_k_correct)
from .optim import (OptimConfig, cosine_schedule, lr_schedule,
                    make_optimizer, weight_decay_mask)
from .state import TrainState, ema_update

__all__ = [
    "CheckpointManager",
    "OptimConfig",
    "TrainConfig",
    "TrainState",
    "checkpoint",
    "cosine_schedule",
    "lr_schedule",
    "cross_entropy",
    "distillation_loss",
    "ema_update",
    "engine",
    "label_smoothing_cross_entropy",
    "losses",
    "make_eval_step",
    "make_optimizer",
    "make_per_example_correct_step",
    "make_train_step",
    "optim",
    "restore_raw",
    "unpack_checkpoint_archive",
    "soft_target_cross_entropy",
    "state",
    "top_k_correct",
    "weight_decay_mask",
]
