"""Checkpoint save/restore (orbax).

Parity with the reference checkpoint protocol (main.py:401-424,501-523):
- per-epoch ``checkpoint`` with model/optimizer/epoch/EMA/args,
- ``epoch@N`` snapshots every ``snapshot_every`` epochs,
- ``best`` / ``best_ema`` on new max accuracy,
- resume restores params (+ optimizer/epoch/EMA unless eval-only),
- supernet->subnet inheritance and finetune interpolation consume the same
  files through ``models.surgery``.

The train-state pytree is stored with orbax; run metadata (epoch, args,
accuracies — the reference embeds the argparse namespace, main.py:511) is a
sidecar ``metadata.json`` next to each checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, snapshot_every: int = 10):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.snapshot_every = snapshot_every
        self._checkpointer = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.directory, f"{name}.metadata.json")

    def save(self, name: str, state: TrainState, metadata: Dict[str, Any]) -> None:
        self._checkpointer.save(self._path(name), state, force=True)
        self._checkpointer.wait_until_finished()
        with open(self._meta_path(name), "w") as f:
            json.dump(metadata, f)

    def save_epoch(self, state: TrainState, epoch: int,
                   metadata: Optional[Dict[str, Any]] = None,
                   is_best: bool = False, is_best_ema: bool = False) -> None:
        meta = dict(metadata or {}, epoch=epoch)
        self.save("checkpoint", state, meta)
        if self.snapshot_every and (epoch + 1) % self.snapshot_every == 0:
            self.save(f"epoch@{epoch}", state, meta)
        if is_best:
            self.save("best", state, meta)
        if is_best_ema and state.ema_params is not None:
            self.save("best_ema", state, meta)

    def restore(self, name: str, target_state: TrainState) -> Tuple[TrainState, Dict]:
        """Restore into the structure of ``target_state``."""
        restored = self._checkpointer.restore(self._path(name), target=target_state)
        metadata: Dict[str, Any] = {}
        if os.path.exists(self._meta_path(name)):
            with open(self._meta_path(name)) as f:
                metadata = json.load(f)
        return restored, metadata

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def latest(self) -> Optional[str]:
        return "checkpoint" if self.exists("checkpoint") else None


def unpack_checkpoint_archive(path: str) -> str:
    """Extract a ``.zip``/``.tar[.gz|.bz2|.xz]`` of an orbax checkpoint dir.

    Supports ``--resume http(s)://...`` (reference main.py:402-404 resumes
    from URLs via torch.hub): an orbax checkpoint is a *directory*, so over
    HTTP it travels as an archive.  Extraction is idempotent (a ``.ok``
    marker next to the archive) and returns the inner checkpoint directory
    (the one holding orbax's ``_METADATA``/``_CHECKPOINT_METADATA``).
    """
    import shutil

    lower = path.lower()
    if not lower.endswith((".zip", ".tar", ".tar.gz", ".tgz",
                           ".tar.bz2", ".tar.xz")):
        return path
    dest = path + ".extracted"
    marker = dest + ".ok"
    if not os.path.exists(marker):
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        if lower.endswith((".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tar.xz")):
            # filter="data" rejects ../ and absolute member paths (tar-slip):
            # --resume URLs are untrusted input
            import tarfile

            with tarfile.open(path) as tf:
                tf.extractall(dest, filter="data")
        else:
            shutil.unpack_archive(path, dest)
        with open(marker, "w") as f:
            f.write("ok")
    found = []
    for root, dirs, files in os.walk(dest):
        if "_METADATA" in files or "_CHECKPOINT_METADATA" in files:
            found.append(root)
            dirs.clear()  # don't descend into the checkpoint itself
    if not found:
        raise FileNotFoundError(
            f"{path}: archive contains no orbax checkpoint directory")
    # archives of a whole checkpoints/ dir hold several (best, epoch@N...):
    # prefer the canonical resume target
    for root in sorted(found):
        if os.path.basename(root) == "checkpoint":
            return root
    return sorted(found)[0]


def restore_raw(path: str) -> Dict[str, Any]:
    """Load a checkpoint as raw numpy trees (no target structure).

    Consumers that only need a sub-tree — the teacher loader, finetune
    interpolation, supernet->subnet inheritance — read
    ``restore_raw(path)["params"]`` (or ``["ema_params"]``, which the
    finetune path prefers like the reference,
    network_utils/finetune_state_dict.py:10-21).

    Leaves are restored as *numpy* arrays explicitly: jax.Array restoration
    requires concrete shardings under multi-process runs (orbax refuses
    ``sharding=None`` there), while numpy restoration is valid in any
    process topology — each host reads the full tree, exactly like the
    reference's per-rank ``torch.load``.
    """
    import jax
    import numpy as np

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    if hasattr(meta, "item_metadata"):  # StepMetadata wrapper
        meta = meta.item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    restored = ckptr.restore(path, restore_args=restore_args)
    out = dict(restored) if isinstance(restored, dict) else restored.__dict__
    meta_path = f"{path}.metadata.json"
    out["metadata"] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out["metadata"] = json.load(f)
    return out
