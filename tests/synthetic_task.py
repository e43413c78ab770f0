"""Shared synthetic LEARNABLE segmentation task for trained-quality tests.

Pixel class is a deterministic function of pixel color (rectangles of
palette colors + small noise), so short training runs reach well-above-
chance mIoU and two training stacks can be compared on *outcome* quality.
Used by tests/test_accuracy_parity.py (ours vs tf.keras) and
tests/test_bf16_quality.py (ours-bf16 vs ours-fp32).
"""

from __future__ import annotations

import numpy as np


def _palette():
    """21 well-separated colors in (-1,1)³: the {-0.8, 0, 0.8}³ grid (27
    points), deterministically shuffled, first 21 taken.  Min pairwise L2
    distance 0.8 — far above the 0.05 pixel noise below."""
    grid = np.array(
        [(r, g, b) for r in (-0.8, 0.0, 0.8) for g in (-0.8, 0.0, 0.8)
         for b in (-0.8, 0.0, 0.8)],
        dtype=np.float32,
    )
    order = np.random.default_rng(42).permutation(27)[:21]
    return grid[order]


PALETTE = _palette()


def make_batch(rng, batch, size):
    """Images of colored rectangles; class = rectangle color's palette id.

    Rectangle sides are 40..80 px at size 96: the reference architecture
    at output_stride 16 (and the refinement quirk of reusing the SAME
    backbone endpoint as "low-level" features, semantic_segmentation.py
    :930) bottlenecks ALL spatial detail through a 6x6 feature map, so
    boundary placement is ~16-px-coarse at best; shapes must be large
    relative to that for the task's achievable mIoU to be high.

    Returns (image (B,S,S,3) fp32 in (-1,1), label (B,S,S) int32)."""
    label = np.zeros((batch, size, size), np.int32)
    lo, hi = (size * 5) // 12, (size * 5) // 6
    for b in range(batch):
        for _ in range(3):
            c = int(rng.integers(1, 21))
            h0, w0 = rng.integers(0, size - lo, 2)
            h1 = h0 + int(rng.integers(lo, hi))
            w1 = w0 + int(rng.integers(lo, hi))
            label[b, h0:h1, w0:w1] = c
    image = PALETTE[label] + rng.normal(0, 0.05, (batch, size, size, 3))
    return np.clip(image, -1, 1).astype(np.float32), label


def miou(cm):
    diag = np.diag(cm).astype(np.float64)
    denom = cm.sum(0) + cm.sum(1) - diag
    valid = denom > 0
    return float((diag[valid] / denom[valid]).mean())


def np_cm(labels, preds, num_classes=21):
    idx = labels.reshape(-1) * num_classes + preds.reshape(-1)
    return np.bincount(idx, minlength=num_classes * num_classes).reshape(
        num_classes, num_classes
    )


def checkpoint_steps(n_steps: int, n_checkpoints: int, eval_every: int):
    """The eval schedule: ``n_checkpoints`` evals, ``eval_every`` steps
    apart, ending at the final step.  Validates the run is long enough up
    front (ADVICE r3: negative indices silently skipped evals)."""
    need = (n_checkpoints - 1) * eval_every + 1
    if n_steps < need:
        raise ValueError(
            f"n_steps {n_steps} too short for {n_checkpoints} checkpoints "
            f"every {eval_every} steps (need >= {need})"
        )
    return {n_steps - 1 - eval_every * i for i in range(n_checkpoints)}
