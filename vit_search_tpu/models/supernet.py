"""Supernet architecture sampling: keep-count pytrees and mask building.

Replaces the reference's stateful per-module ChannelDrop sampling
(nets/channel_drop.py driven by nets/vit_sr_supernet.py:465-477 and the RNG
bracket in engine.py:119-132) with an explicit pipeline:

  host:   SupernetSchedules.sample(rng, batch)  ->  keep-count pytree (ints)
  device: build_arch_masks(counts, ...)          ->  boolean mask pytree
  device: model(x, masks=...)                    ->  one compiled program

The keep-count pytree mirrors the network_def slots::

  {'embed': (A,) ints | None,
   'slots': {slot: {'attn': (A,), 'mlp': (A,), 'layer': (A,)|None}   # transformer
                   | {'embed': (A,)}                                  # SR block
            }}

``A`` is ``batch // example_per_arch`` for multi-arch sites or 1 for shared
(single/hybrid) sites; masks are expanded round-robin over the batch.

Arch-sampling modes (reference main.py:440-450):
  - ``single``: one architecture per step shared by the whole batch,
  - ``hybrid``: embedding/SR widths shared, per-sub-batch block masks,
  - ``multi``:  everything per-sub-batch.
Cross-host determinism comes from seeding the sampler with
``(epoch, step)`` (replacing the reference's global-RNG reseeding trick,
engine.py:119-132).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..arch import network_def as nd
from ..ops.masking import (ChannelDropSchedule, expand_arch_counts,
                           make_channel_mask)

ARCH_MODES = ("single", "hybrid", "multi")


class SupernetSchedules:
    """Host-side keep-count sampler for every ChannelDrop site of a supernet."""

    def __init__(self, network_def: Sequence, space: Sequence,
                 example_per_arch: Optional[int], num_warmup_epochs: int = 15,
                 arch_mode: str = "multi"):
        if arch_mode not in ARCH_MODES:
            raise ValueError(f"arch_mode must be one of {ARCH_MODES}")
        if len(space) != len(network_def):
            raise ValueError("search space and network_def length mismatch")
        self.network_def = nd.to_immutable(network_def)
        self.space = space
        self.arch_mode = arch_mode
        self.example_per_arch = example_per_arch

        shared = arch_mode in ("single", "hybrid")      # embed/SR sites
        block_shared = arch_mode == "single"            # attn/mlp/layer sites

        def make(widths, single):
            return ChannelDropSchedule(widths, num_warmup_epochs=num_warmup_epochs,
                                       example_per_arch=example_per_arch,
                                       single_arch=single)

        self.embed: Optional[ChannelDropSchedule] = None
        self.slots: Dict[int, Dict[str, ChannelDropSchedule]] = {}

        for slot, (block, keep) in enumerate(zip(self.network_def, space)):
            btype = nd.block_type(block)
            if btype in nd.EMBED_TYPES:
                self.embed = make(keep, shared)
            elif btype == nd.SPATIAL_REDUCTION:
                self.slots[slot] = {"embed": make(keep, shared)}
            elif btype == nd.TRANSFORMER:
                site = {"attn": make(keep["attn"], block_shared),
                        "mlp": make(keep["mlp"], block_shared)}
                if keep.get("layer") is not None:
                    site["layer"] = make(keep["layer"], block_shared)
                self.slots[slot] = site

    def set_epoch(self, epoch: int) -> None:
        if self.embed is not None:
            self.embed.set_epoch(epoch)
        for site in self.slots.values():
            for sched in site.values():
                sched.set_epoch(epoch)

    def sample(self, rng: np.random.Generator, batch: int) -> Dict:
        """Per-step keep counts for every site (host, numpy)."""
        counts = {"embed": None if self.embed is None else self.embed.sample(rng, batch),
                  "slots": {}}
        for slot, site in self.slots.items():
            counts["slots"][slot] = {k: s.sample(rng, batch) for k, s in site.items()}
        return counts

    def full_counts(self) -> Dict:
        """Eval-mode counts: every channel kept (shape (1,), broadcast)."""
        counts = {"embed": None if self.embed is None else self.embed.full_counts(),
                  "slots": {}}
        for slot, site in self.slots.items():
            counts["slots"][slot] = {k: s.full_counts() for k, s in site.items()}
        return counts

    # -- packed transport: one int32 vector instead of ~dozens of tiny arrays
    # (each traced array is a separate host->device transfer per step; over a
    # high-latency link that dominates the masking overhead)

    def _site_order(self):
        order = []
        if self.embed is not None:
            order.append((("embed",), self.embed))
        for slot in sorted(self.slots):
            for key in sorted(self.slots[slot]):
                order.append((("slots", slot, key), self.slots[slot][key]))
        return order

    def packed_layout(self, batch: int) -> tuple:
        """Static (path, count_len) layout for a given batch size."""
        layout = []
        for path, sched in self._site_order():
            n = 1 if sched.single_arch else batch // sched.example_per_arch
            layout.append((path, n))
        return tuple(layout)

    def pack(self, counts: Dict, batch: int) -> np.ndarray:
        parts = []
        for path, n in self.packed_layout(batch):
            node = counts
            for key in path:
                node = node[key]
            assert len(node) == n, (path, len(node), n)
            parts.append(np.asarray(node, dtype=np.int32))
        return np.concatenate(parts)

    def sample_packed(self, rng: np.random.Generator, batch: int) -> np.ndarray:
        return self.pack(self.sample(rng, batch), batch)

    def unpack(self, vector, batch: int) -> Dict:
        """Inverse of :meth:`pack`; jit-friendly (static slices)."""
        counts: Dict = {"embed": None, "slots": {}}
        offset = 0
        for path, n in self.packed_layout(batch):
            piece = vector[offset:offset + n]
            offset += n
            if path == ("embed",):
                counts["embed"] = piece
            else:
                _, slot, key = path
                counts["slots"].setdefault(slot, {})[key] = piece
        return counts

    def counts_for_subnets(self, sub_defs: Sequence[Sequence]) -> Dict:
        """Keep counts representing explicit candidate network_defs.

        Candidate ``a`` of the returned ``(A,)`` arrays selects exactly the
        sub-architecture ``sub_defs[a]`` — the masked-evaluation equivalent of
        the reference's per-candidate weight extraction
        (nets/net_utils.py:34-57, evo_search.py:253-287).
        """
        A = len(sub_defs)
        for sub in sub_defs:
            if len(sub) != len(self.network_def):
                raise ValueError("candidate def has different slot count")
        counts = {"embed": None, "slots": {}}
        if self.embed is not None:
            counts["embed"] = np.array(
                [nd.embed_channels(sub[0]) for sub in sub_defs], dtype=np.int64)
        for slot, site in self.slots.items():
            sup_block = self.network_def[slot]
            if nd.block_type(sup_block) == nd.SPATIAL_REDUCTION:
                counts["slots"][slot] = {"embed": np.array(
                    [nd.sr_channels(sub[slot])[1] for sub in sub_defs], dtype=np.int64)}
                continue
            sup = nd.transformer_def(sup_block)
            attn = np.empty(A, dtype=np.int64)
            mlp = np.empty(A, dtype=np.int64)
            layer = np.empty(A, dtype=np.int64)
            for a, sub in enumerate(sub_defs):
                tdef = nd.transformer_def(sub[slot])
                if tdef.head_dim != sup.head_dim:
                    raise ValueError(f"slot {slot}: head_dim mismatch")
                exists = tdef.exists
                attn[a] = tdef.attn_width if exists else sup.attn_width
                mlp[a] = tdef.ffn_hidden if exists else sup.ffn_hidden
                layer[a] = sup.embed_dim if exists else 0
            entry = {"attn": attn, "mlp": mlp}
            if "layer" in site:
                entry["layer"] = layer
            else:
                for a, sub in enumerate(sub_defs):
                    if not nd.transformer_def(sub[slot]).exists:
                        raise ValueError(
                            f"slot {slot}: candidate removes a non-removable block")
            counts["slots"][slot] = entry
        return counts


def build_arch_masks(counts: Optional[Dict], network_def: Sequence, batch: int,
                     dtype=jnp.bool_) -> Optional[Dict]:
    """Turn a keep-count pytree into the mask pytree the model consumes.

    Jit-friendly: shapes depend only on ``network_def`` and ``batch``; the
    counts are traced data.
    """
    if counts is None:
        return None

    def mask_for(count_arr, width):
        per_example = expand_arch_counts(jnp.asarray(count_arr), batch)
        return make_channel_mask(per_example, width, dtype=dtype)

    stem_width = nd.embed_channels(network_def[0])
    masks = {"embed": None, "slots": {}}
    if counts.get("embed") is not None:
        masks["embed"] = mask_for(counts["embed"], stem_width)

    for slot, site in counts.get("slots", {}).items():
        block = network_def[slot]
        btype = nd.block_type(block)
        if btype == nd.SPATIAL_REDUCTION:
            out_w = nd.sr_channels(block)[1]
            masks["slots"][slot] = {"embed": mask_for(site["embed"], out_w)}
        else:
            tdef = nd.transformer_def(block)
            entry = {"attn": mask_for(site["attn"], tdef.attn_width),
                     "mlp": mask_for(site["mlp"], tdef.ffn_hidden)}
            if site.get("layer") is not None:
                entry["layer"] = mask_for(site["layer"], tdef.embed_dim)
            masks["slots"][slot] = entry
    return masks
