"""Sub-train / sub-val holdout builder.

Reproduces the capability of the reference subset builder
(search_utils/build_subset.py): split the ImageNet train set into
``sub-train`` (supernet training) and ``sub-val`` (search fitness), holding
out a fixed number of images per class.  The reference pins its holdout in
a shipped pickle; here the selection is deterministic from a seed and
persisted as JSON next to the data (equivalent reproducibility without a
binary artifact), and an existing manifest — including one converted from
the reference pickle — takes precedence.

Files are hard-linked when possible (falls back to copying), so the split
costs no extra disk for the common single-filesystem case.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import numpy as np

DEFAULT_HOLDOUT_PER_CLASS = 25  # reference: 25 images/class x 1000 classes


def select_holdout(train_dir: str, per_class: int = DEFAULT_HOLDOUT_PER_CLASS,
                   seed: int = 0) -> Dict[str, List[str]]:
    """Deterministically pick ``per_class`` holdout file names per class."""
    rng = np.random.default_rng(seed)
    holdout: Dict[str, List[str]] = {}
    for cls in sorted(d.name for d in os.scandir(train_dir) if d.is_dir()):
        files = sorted(e.name for e in os.scandir(os.path.join(train_dir, cls))
                       if e.is_file())
        if len(files) < per_class:
            raise ValueError(f"class {cls} has only {len(files)} images")
        pick = rng.choice(len(files), size=per_class, replace=False)
        holdout[cls] = sorted(files[i] for i in pick)
    return holdout


def _place(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copyfile(src, dst)


def build_subsets(data_path: str, per_class: int = DEFAULT_HOLDOUT_PER_CLASS,
                  seed: int = 0, manifest_path: Optional[str] = None) -> str:
    """Materialize ``sub-train``/``sub-val`` under ``data_path``.

    Returns the manifest path.  A pre-existing manifest wins over fresh
    selection, so splits are stable across machines.
    """
    train_dir = os.path.join(data_path, "train")
    manifest_path = manifest_path or os.path.join(data_path, "sub_val_files.json")

    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            holdout = json.load(f)
    else:
        holdout = select_holdout(train_dir, per_class=per_class, seed=seed)
        with open(manifest_path, "w") as f:
            json.dump(holdout, f)

    sub_train = os.path.join(data_path, "sub-train")
    sub_val = os.path.join(data_path, "sub-val")
    for cls, held in holdout.items():
        held_set = set(held)
        src_dir = os.path.join(train_dir, cls)
        train_dst = os.path.join(sub_train, cls)
        val_dst = os.path.join(sub_val, cls)
        os.makedirs(train_dst, exist_ok=True)
        os.makedirs(val_dst, exist_ok=True)
        for entry in os.scandir(src_dir):
            if not entry.is_file():
                continue
            dst = val_dst if entry.name in held_set else train_dst
            target = os.path.join(dst, entry.name)
            if not os.path.exists(target):
                _place(entry.path, target)
    return manifest_path
