"""Training callbacks.

Ports of the two callbacks the reference actually enables
(semantic_segmentation.py:978-986): ``ReduceLROnPlateau(monitor='loss',
factor=reduce_lr_factor, patience=5, min_lr=1e-8)`` and best-val-loss
checkpointing (the TensorBoard callback is constructed but never passed,
:987-990/:1007 — here the equivalent is the optional jax.profiler trace in
utils/profiling).
"""

from __future__ import annotations

import math


class ReduceLROnPlateau:
    """Keras semantics: if the monitored value hasn't improved for
    ``patience`` epochs, multiply LR by ``factor`` (not below min_lr)."""

    def __init__(
        self,
        factor: float,
        patience: int = 5,
        min_lr: float = 1e-8,
        min_delta: float = 1e-4,
    ):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.min_delta = min_delta
        self.best = math.inf
        self.wait = 0

    def update(self, monitored: float, current_lr: float) -> float:
        """Returns the (possibly reduced) LR after this epoch."""
        if monitored < self.best - self.min_delta:
            self.best = monitored
            self.wait = 0
            return current_lr
        self.wait += 1
        if self.wait >= self.patience:
            self.wait = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr
