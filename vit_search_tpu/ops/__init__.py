"""Core compute ops: channel masking, masked layer norm, drop path.

Pallas TPU kernels for the hot masked ops live in ``vit_search_tpu.ops.pallas``
(imported lazily; the plain-JAX paths here are the reference numerics and the
fallback on non-TPU backends).
"""

from .drop_path import drop_path
from .masked_layer_norm import masked_layer_norm
from .masking import (ChannelDropSchedule, DEFAULT_NUM_WARMUP_EPOCHS,
                      expand_arch_counts, make_channel_mask)

__all__ = [
    "ChannelDropSchedule",
    "DEFAULT_NUM_WARMUP_EPOCHS",
    "drop_path",
    "expand_arch_counts",
    "make_channel_mask",
    "masked_layer_norm",
]
