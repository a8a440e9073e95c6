"""Model hub entry points (reference ``hubconf.py``/``models.py`` parity).

The reference exposes DeiT models through torch.hub with pretrained-URL
loading (hubconf.py:7-9, models.py:15-57).  The TPU-native equivalent:
``load(name, checkpoint=..., **kwargs)`` returns an initialized
``(model, variables)`` pair, restoring weights from a local checkpoint
directory when given (this environment has no network egress; URL support
would hang — point ``checkpoint`` at a downloaded orbax directory).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from .models import available_models, create_model
from .train.checkpoint import restore_raw

dependencies = ["jax", "flax"]  # torch.hub-style declaration, for parity


def load(name: str, checkpoint: Optional[str] = None, img_size: int = 224,
         seed: int = 0, **kwargs) -> Tuple[Any, dict]:
    """Create a registered model and (optionally) load trained weights."""
    import jax
    import jax.numpy as jnp

    model = create_model(name, img_size=img_size, **kwargs)
    sample = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(seed), sample))
    if checkpoint:
        raw = restore_raw(checkpoint)
        variables["params"] = raw.get("ema_params") or raw["params"]
        if raw.get("batch_stats"):
            variables["batch_stats"] = raw["batch_stats"]
    return model, variables


def list_models():
    return available_models()
