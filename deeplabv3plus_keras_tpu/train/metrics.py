"""Streaming mean-IoU over an accumulated confusion matrix.

Reference ``MeanIoUExt`` (semantic_segmentation.py:283-334): takes ONE-HOT
truth/prediction tensors, argmaxes both, flattens, accumulates a confusion
matrix (``accum_enable`` toggles add vs replace), and reduces with the
Keras MeanIoU formula: per-class IoU = diag / (rowsum + colsum − diag),
averaged over classes whose denominator is > 0.

Here the update is a jittable scatter-add (no host loop); counts are int32
(sufficient for ~8k 512² images per class pair; the reference used float64
because TF's confusion_matrix required a float dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def empty_confusion_matrix(num_classes: int):
    return jnp.zeros((num_classes, num_classes), jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix_update(y_true, y_pred, num_classes: int, sample_valid=None):
    """One batch's confusion matrix from one-hot (or probability) tensors.

    y_true / y_pred: (B, ..., C) — argmaxed over the last axis, mirroring
    the reference's K.argmax on both (:310-311).  ``sample_valid`` is an
    optional (B,) 0/1 vector excluding padded samples (static-shape
    replacement for the reference's ragged last batch, :1521-1560).
    """
    t = jnp.argmax(y_true, axis=-1)
    p = jnp.argmax(y_pred, axis=-1)
    if sample_valid is not None:
        w = jnp.broadcast_to(
            sample_valid.astype(jnp.int32).reshape((-1,) + (1,) * (t.ndim - 1)),
            t.shape,
        ).reshape(-1)
    else:
        w = jnp.ones(t.size, jnp.int32)
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    return cm.at[t.reshape(-1), p.reshape(-1)].add(w)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix_update_sparse(labels, y_pred, num_classes: int, sample_valid=None):
    """Integer-label confusion-matrix update: labels (B, ...) int vs
    argmax(y_pred) — avoids the one-hot argmax round trip."""
    t = labels.astype(jnp.int32)
    p = jnp.argmax(y_pred, axis=-1)
    if sample_valid is not None:
        w = jnp.broadcast_to(
            sample_valid.astype(jnp.int32).reshape((-1,) + (1,) * (t.ndim - 1)),
            t.shape,
        ).reshape(-1)
    else:
        w = jnp.ones(t.size, jnp.int32)
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    return cm.at[t.reshape(-1), p.reshape(-1)].add(w)


def mean_iou_from_cm(cm):
    """Keras MeanIoU reduction: mean over classes with nonzero denominator."""
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    diag = jnp.diagonal(cm)
    denom = cm.sum(axis=0) + cm.sum(axis=1) - diag
    valid = denom > 0
    iou = jnp.where(valid, diag / jnp.where(valid, denom, 1.0), 0.0)
    n_valid = jnp.maximum(valid.sum(), 1)
    return iou.sum() / n_valid


class MeanIoU:
    """Host-side streaming accumulator (API analogue of MeanIoUExt).

    ``accum_enable=False`` replaces instead of accumulating (:333-334).
    """

    def __init__(self, num_classes: int, accum_enable: bool = True):
        self.num_classes = num_classes
        self.accum_enable = accum_enable
        self.reset()

    def reset(self):
        import numpy as np

        self.total_cm = np.zeros((self.num_classes, self.num_classes), np.int64)

    def update_state(self, y_true, y_pred):
        import numpy as np

        cm = np.asarray(confusion_matrix_update(y_true, y_pred, self.num_classes))
        if self.accum_enable:
            self.total_cm += cm
        else:
            self.total_cm = cm.astype(self.total_cm.dtype)
        return self

    def update_from_cm(self, cm):
        import numpy as np

        if self.accum_enable:
            self.total_cm += np.asarray(cm, dtype=self.total_cm.dtype)
        else:
            self.total_cm = np.asarray(cm, dtype=self.total_cm.dtype)
        return self

    def result(self) -> float:
        import numpy as np

        cm = self.total_cm.astype(np.float64)
        diag = np.diagonal(cm)
        denom = cm.sum(axis=0) + cm.sum(axis=1) - diag
        valid = denom > 0
        if not valid.any():
            return 0.0
        return float((diag[valid] / denom[valid]).mean())
