"""Checkpoint / resume.

Reference persistence: Keras ``ModelCheckpoint(monitor='val_loss',
save_best_only=True)`` into the SavedModel directory
``semantic_segmentation_deeplabv3plus`` (semantic_segmentation.py:983-986,
:454), reloaded under ``CustomObjectScope`` when ``model_loading`` is true
(:482-490).  TPU-native equivalent: an Orbax checkpoint of
params + batch_stats + opt_state + step with best-val-loss retention, so a
crashed run resumes exactly (the reference could only resume params at
epoch granularity).
"""

from __future__ import annotations

import json
import os
from typing import Any

MODEL_DIR = "semantic_segmentation_deeplabv3plus"  # reference :454


def _ckpt_dir(base_dir: str | None) -> str:
    return os.path.abspath(os.path.join(base_dir or ".", MODEL_DIR))


def save_checkpoint(state, base_dir: str | None = None, *, val_loss: float | None = None, best_only: bool = True) -> bool:
    """Save if ``val_loss`` improves on the stored best (or always when
    best_only=False).  Returns True if written."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(base_dir)
    meta_path = os.path.join(path, "meta.json")
    best = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            best = json.load(f).get("best_val_loss")
    if best_only and val_loss is not None and best is not None and val_loss >= best:
        return False

    import shutil

    # Atomic swap: write the full new checkpoint to 'state.tmp' first, keep
    # the previous one at 'state.old' until the rename lands — a crash at any
    # point leaves a restorable checkpoint ('state' or 'state.old').
    ckptr = ocp.StandardCheckpointer()
    tree_path = os.path.join(path, "state")
    tmp_path, old_path = tree_path + ".tmp", tree_path + ".old"
    for stale in (tmp_path, old_path):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    ckptr.save(tmp_path, state)
    ckptr.wait_until_finished()
    if os.path.exists(tree_path):
        os.rename(tree_path, old_path)
    os.rename(tmp_path, tree_path)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    # A val_loss-less save (e.g. preemption) keeps the stored best so that
    # best-only retention continues correctly after resume.
    with open(meta_path, "w") as f:
        json.dump(
            {
                "best_val_loss": float(val_loss) if val_loss is not None else best,
                "step": int(state.step),
            },
            f,
        )
    return True


def restore_checkpoint(state_template, base_dir: str | None = None):
    """Restore into the structure of ``state_template``; returns state."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(base_dir)
    tree_path = os.path.join(path, "state")
    if not os.path.exists(tree_path) and os.path.exists(tree_path + ".old"):
        tree_path += ".old"  # crash landed between the atomic-swap renames
    if not os.path.exists(tree_path):
        raise FileNotFoundError(f"no checkpoint at {tree_path}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(tree_path, state_template)


def checkpoint_exists(base_dir: str | None = None) -> bool:
    tree_path = os.path.join(_ckpt_dir(base_dir), "state")
    return os.path.exists(tree_path) or os.path.exists(tree_path + ".old")
