"""Train state: parameters, optimizer state, batch stats, EMA.

The EMA follows the reference ``ModelEmaV2`` semantics: per-step
``ema = decay * ema + (1 - decay) * params`` with decay 0.99996
(reference main.py:93,357-363; engine.py:179-180).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = struct.field(default_factory=dict)
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation,
               batch_stats: Any = None, use_ema: bool = False) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   opt_state=tx.init(params),
                   batch_stats=batch_stats if batch_stats is not None else {},
                   # real copies — params/EMA must not alias (donation safety)
                   ema_params=jax.tree.map(jnp.copy, params) if use_ema else None)


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                        ema_params, params)
