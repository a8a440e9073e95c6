"""Batched candidate scoring on the supernet.

The reference scores each search candidate by building a new model,
slicing supernet weights into it, DDP-wrapping it and running a full
sub-val evaluation — per candidate (evo_search.py:253-287).  On TPU that
rebuild/retrace loop is replaced by *masked batched evaluation*: candidates
become keep-count columns, every sub-val batch is tiled ``A`` times (one
replica per candidate), and one compiled program scores ``A`` candidates at
once.  Valid because candidate extraction is prefix slicing
(nets/net_utils.py:34-57) and masked forward == sliced forward
(tests/test_models.py equivalence suite).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import normalize_images
from ..models.supernet import SupernetSchedules, build_arch_masks
from ..parallel import shard_batch

# The eval loader ships uint8 batches (4x smaller host->HBM transfers);
# normalization happens on device inside the compiled step, with the same
# ImageNet constants the train/eval engine uses (engine.TrainConfig —
# the reference applies these in its GPU prefetcher, datasets.py:170-184).
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _tile_counts(counts: Dict, batch: int) -> Dict:
    """Expand per-candidate counts (A,) to per-example (A*batch,), candidate-major."""

    def tile(arr):
        return None if arr is None else np.repeat(np.asarray(arr), batch)

    out = {"embed": tile(counts.get("embed")), "slots": {}}
    for slot, site in counts["slots"].items():
        out["slots"][slot] = {k: tile(v) for k, v in site.items()}
    return out


def make_tiled_correct_step(model, score_head: str = "cls"):
    """Per-candidate correct counts with on-device batch replication.

    The (B, H, W, 3) eval batch crosses host->device once; replication to
    (A*B, ...) happens inside the compiled program, so scoring A candidates
    costs the same transfer as scoring one.

    ``score_head`` picks the logits that define a candidate's fitness:
    ``cls`` (default), ``dst`` (distill head — what the reference uses when
    the supernet carries a distill token, evo_search.py:280-282), or
    ``joint`` (softmax sum of both, the reference's ``jnt_acc1``).
    """
    if score_head not in ("cls", "dst", "joint"):
        raise ValueError(f"unknown score head {score_head!r}")
    if score_head in ("dst", "joint") and not getattr(model, "distill_token",
                                                      False):
        raise ValueError(f"score head {score_head!r} needs a distill-token "
                         f"supernet")

    def step(params, batch_stats, images, labels, valid, counts):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if images.dtype == jnp.uint8:
            # normalize BEFORE tiling: once per image instead of A times
            images = normalize_images(images, _IMAGENET_MEAN, _IMAGENET_STD)
        a = jax.tree.leaves(counts)[0].shape[0]
        b = images.shape[0]
        images_t = jnp.tile(images, (a, 1, 1, 1))
        labels_t = jnp.tile(labels, a)
        per_example = {"embed": None, "slots": {}}
        if counts.get("embed") is not None:
            per_example["embed"] = jnp.repeat(counts["embed"], b)
        for slot, site in counts["slots"].items():
            per_example["slots"][slot] = {k: jnp.repeat(v, b)
                                          for k, v in site.items()}
        masks = build_arch_masks(per_example, model.network_def, a * b)
        outputs = model.apply(variables, images_t, masks, deterministic=True)
        if score_head == "cls":
            pred = outputs[0] if isinstance(outputs, tuple) else outputs
        elif score_head == "dst":
            pred = outputs[1]
        else:  # joint
            pred = (jax.nn.softmax(outputs[0].astype(jnp.float32), axis=-1)
                    + jax.nn.softmax(outputs[1].astype(jnp.float32), axis=-1))
        correct = (jnp.argmax(pred, axis=-1) == labels_t).astype(jnp.float32)
        # weight by per-example validity so batch/shard padding rows score 0
        correct = correct * jnp.tile(valid.astype(jnp.float32), a)
        # valid is mesh-sharded like the batch, so this sum is the GLOBAL
        # number of real rows this batch contributes (exact across hosts
        # with unequal shard tails)
        return correct.reshape(a, b).sum(axis=1), jnp.sum(valid)

    return jax.jit(step)


class BatchedSupernetEvaluator:
    """Score populations of network_defs on a fixed sub-val loader."""

    def __init__(self, model, params, batch_stats, schedules: SupernetSchedules,
                 loader, arch_batch: int = 8, score_head: str = "auto",
                 mesh=None):
        """With ``mesh``, every sub-val batch is sharded over the data axis
        so candidate scoring uses the whole mesh — the counterpart of the
        reference's DDP candidate evaluation across 8 GPUs
        (evo_search.py:269-287).  Params are replicated on the mesh once.
        On pods, each host's loader carries its rank's shard and the
        per-candidate correct counts come back as GSPMD-global sums.
        """
        if score_head == "auto":
            # reference evo_search.py:280-285: dst_acc1 when the supernet
            # reports a distill head, acc1 otherwise
            score_head = ("dst" if getattr(model, "distill_token", False)
                          else "cls")
        self.model = model
        self.batch_stats = batch_stats
        self.schedules = schedules
        self.loader = loader
        self.arch_batch = arch_batch
        self.score_head = score_head
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicate

            params = replicate(mesh, params)
            if batch_stats:
                self.batch_stats = replicate(mesh, batch_stats)
        self.params = params
        self._step = make_tiled_correct_step(model, score_head)

    def _score_chunk(self, sub_defs: Sequence) -> np.ndarray:
        a = len(sub_defs)
        counts = self.schedules.counts_for_subnets(sub_defs)
        counts = {"embed": None if counts["embed"] is None
                  else jnp.asarray(counts["embed"]),
                  "slots": {slot: {k: jnp.asarray(v) for k, v in site.items()}
                            for slot, site in counts["slots"].items()}}
        correct = np.zeros(a, dtype=np.float64)
        total = 0.0
        # Per-candidate correct counts and the valid-row total accumulate
        # on device; the host drains every `sync_every` batches instead of
        # one blocking round-trip per batch.  Keep this SMALL: on remote
        # (tunneled) backends a deep unmaterialized dispatch queue degrades
        # pathologically (measured: sync_every=10 stalled candidate
        # scoring by >10x; 2 is safe and still halves the round-trips).
        device_acc, pending = None, 0
        sync_every = int(os.environ.get("VST_EVAL_SYNC_EVERY", "2"))

        def drain(acc):
            nonlocal correct, total
            correct += np.asarray(acc[0], dtype=np.float64)
            total += float(acc[1])

        for batch in self.loader:
            images, labels = batch[0], batch[1]
            valid = (batch[2] if len(batch) > 2
                     else np.ones(images.shape[0], np.float32))
            if self.mesh is not None:
                images, labels, valid = shard_batch(
                    self.mesh, (images, labels, valid))
            else:
                images, labels, valid = (jnp.asarray(images),
                                         jnp.asarray(labels),
                                         jnp.asarray(valid))
            per_candidate, valid_sum = self._step(
                self.params, self.batch_stats, images, labels, valid, counts)
            device_acc = ((per_candidate, valid_sum) if device_acc is None
                          else (device_acc[0] + per_candidate,
                                device_acc[1] + valid_sum))
            pending += 1
            if pending >= sync_every:
                drain(device_acc)
                device_acc, pending = None, 0
        if device_acc is not None:
            drain(device_acc)
        return correct / max(total, 1.0) * 100.0

    def score(self, network_defs: Sequence,
              progress=None) -> List[float]:
        """Top-1 accuracy (%) on the sub-val set for each candidate.

        Chunks of up to ``arch_batch`` candidates share one compiled program
        per (chunk size, batch size) pair; the final partial chunk is padded
        with repeats of the last candidate so no new program shape appears.
        ``progress``: optional callable fed a status line every 10 chunks.
        """
        import time as _time

        t0 = _time.time()
        scores: List[float] = []
        defs = list(network_defs)
        n_chunks = -(-len(defs) // self.arch_batch)
        for i in range(0, len(defs), self.arch_batch):
            if progress and (i // self.arch_batch) % 10 == 0 and i:
                progress(f"scored {i}/{len(defs)} candidates "
                         f"({_time.time() - t0:.0f}s, "
                         f"{i // self.arch_batch}/{n_chunks} chunks)")
            chunk = defs[i:i + self.arch_batch]
            pad = 0
            if len(chunk) < self.arch_batch and len(defs) > self.arch_batch:
                pad = self.arch_batch - len(chunk)
                chunk = chunk + [chunk[-1]] * pad
            chunk_scores = self._score_chunk(chunk)
            scores.extend(chunk_scores[: len(chunk) - pad])
        return scores
