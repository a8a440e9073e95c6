"""Channel masking: the weight-sharing mechanism of supernet training.

The reference implements this as ``ChannelDrop`` modules that materialize
boolean mask banks on the GPU and mutate them per epoch/forward
(reference: nets/channel_drop.py).  On TPU that design retraces XLA, so here
the mechanism is split into:

- a **host-side sampler** (:class:`ChannelDropSchedule`) that reproduces the
  reference's mask-bank schedule — per-epoch progressive warmup over sorted
  candidate widths (channel_drop.py:131-141), cycling bank construction
  (channel_drop.py:145-157) and per-forward bank permutation
  (channel_drop.py:93-111) — but emits integer *keep counts*, not masks;

- a **device-side mask builder** (:func:`make_channel_mask`) that turns keep
  counts into ``(B, 1, C)`` boolean masks with a broadcasted iota compare.
  Keep counts are step *data*: every architecture sample reuses the same
  compiled program (static shapes, no retrace).

Masks always keep a prefix of channels; combined with epoch-boundary
rewiring (models/surgery.py) this is what makes prefix-slicing subnet
extraction meaningful (reference: nets/net_utils.py:10-57).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_NUM_WARMUP_EPOCHS = 15  # nets/supernet_blocks.py:11


def make_channel_mask(keep_counts: jax.Array, num_channels: int,
                      dtype=jnp.bool_) -> jax.Array:
    """Build prefix masks from keep counts.

    Args:
      keep_counts: int array of shape ``(B,)`` — per-example channels to keep.
      num_channels: static channel count ``C``.

    Returns:
      ``(B, 1, C)`` mask; channel ``c`` of example ``b`` is kept iff
      ``c < keep_counts[b]``.
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_channels), 2)
    return (iota < keep_counts.astype(jnp.int32)[:, None, None]).astype(dtype)


def expand_arch_counts(arch_counts: jax.Array, batch: int) -> jax.Array:
    """Tile per-architecture keep counts to per-example keep counts.

    ``arch_counts`` has shape ``(A,)``; examples are assigned round-robin
    (example ``b`` gets architecture ``b % A``), matching the reference's
    ``mask.repeat(example_per_arch, 1, 1)`` tiling (channel_drop.py:105),
    which interleaves architectures across the batch.
    """
    (num_archs,) = arch_counts.shape
    if batch % num_archs != 0:
        raise ValueError(f"batch {batch} not divisible by arch count {num_archs}")
    return jnp.tile(arch_counts, batch // num_archs)


class ChannelDropSchedule:
    """Host-side keep-count sampler for one ChannelDrop site.

    One instance per masked dimension (embedding width, attention width, FFN
    hidden width, layer existence).  Construction mirrors the reference
    module arguments (nets/channel_drop.py:17-41).
    """

    def __init__(self, num_channels_to_keep: Sequence[int],
                 num_warmup_epochs: int = DEFAULT_NUM_WARMUP_EPOCHS,
                 example_per_arch: Optional[int] = None,
                 single_arch: bool = False):
        widths = np.sort(np.asarray(num_channels_to_keep))[::-1]
        if widths.size == 0:
            raise ValueError("num_channels_to_keep is empty")
        self.widths = widths.astype(np.int64)
        self.num_channels = int(widths[0])
        self.num_warmup_epochs = int(num_warmup_epochs)
        self.example_per_arch = example_per_arch
        self.single_arch = single_arch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    @property
    def num_active_widths(self) -> int:
        """Progressive warmup: widths enabled gradually over warmup epochs.

        Reference formula: ``min(1 + floor(epoch*(n-1)/warmup), n)`` clamped
        to at least 1 (channel_drop.py:131-141).
        """
        n = len(self.widths)
        if self.num_warmup_epochs == 0:
            return n
        k = 1 + math.floor(self.epoch * (n - 1) / self.num_warmup_epochs)
        return max(1, min(k, n))

    def _bank(self, num_masks: int) -> np.ndarray:
        """The cycling width bank for this epoch (channel_drop.py:145-157)."""
        active = self.widths[: self.num_active_widths]
        num_cycles = 1 if self.single_arch else math.ceil(num_masks / len(active))
        return np.tile(active, num_cycles)

    def sample(self, rng: np.random.Generator, batch: int) -> np.ndarray:
        """Sample per-architecture keep counts for one step.

        Returns shape ``(1,)`` for single-arch sites, else
        ``(batch // example_per_arch,)``.  Reproduces the reference forward:
        permute the bank, truncate, tile (channel_drop.py:93-111).
        """
        if self.single_arch:
            num_masks = 1
        else:
            if self.example_per_arch is None:
                raise ValueError("example_per_arch required for multi-arch sites")
            if batch % self.example_per_arch != 0:
                raise ValueError(
                    f"batch {batch} not divisible by example_per_arch {self.example_per_arch}")
            num_masks = batch // self.example_per_arch
        bank = self._bank(num_masks)
        if num_masks > len(bank):
            raise ValueError("batch has more sub-batches than mask bank entries")
        return rng.permutation(bank)[:num_masks]

    def full_counts(self, num_masks: int = 1) -> np.ndarray:
        """Eval-mode counts: every channel kept (channel_drop.py:84-89)."""
        return np.full((num_masks,), self.num_channels, dtype=np.int64)
