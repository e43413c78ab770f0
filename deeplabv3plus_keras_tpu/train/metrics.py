"""Streaming mean-IoU over an accumulated confusion matrix.

Reference ``MeanIoUExt`` (semantic_segmentation.py:283-334): takes ONE-HOT
truth/prediction tensors, argmaxes both, flattens, accumulates a confusion
matrix (``accum_enable`` toggles add vs replace), and reduces with the
Keras MeanIoU formula: per-class IoU = diag / (rowsum + colsum − diag),
averaged over classes whose denominator is > 0.

Here the update is an MXU matmul of one-hot indicators (a scatter-add
formulation costs ~19 ms per 8×512² batch on TPU — serialized scatter;
the matmul is ~2 GFLOP and exact); counts are int32 (sufficient for ~8k
512² images per class pair; the reference used float64 because TF's
confusion_matrix required a float dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def empty_confusion_matrix(num_classes: int):
    return jnp.zeros((num_classes, num_classes), jnp.int32)


# fp32 matmul sums are integer-exact only below 2²⁴; chunk with 2× margin so
# any batch size is safe (batch 16 at 1024² = 16.78M pixels exceeds 2²⁴).
CM_CHUNK_PIXELS = 1 << 23


def _cm_matmul(t, p, num_classes: int, sample_valid):
    """cm[i, j] = #pixels with true i, predicted j — computed as
    one_hot(t)ᵀ @ one_hot(p) on the MXU.  A scatter-add formulation costs
    ~19 ms per 8×512² batch on TPU (serialized scatter); the matmul is
    ~2 GFLOP and exact: fp32 sums are integer-exact < 2²⁴, so batches
    bigger than CM_CHUNK_PIXELS accumulate int32 partial matmuls."""
    t1h = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    if sample_valid is not None:
        v = sample_valid.astype(jnp.float32).reshape((-1,) + (1,) * (t1h.ndim - 1))
        t1h = t1h * v
    p1h = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    n = int(np.prod(t.shape))
    t_flat = t1h.reshape(n, num_classes)
    p_flat = p1h.reshape(n, num_classes)

    def part(ts, ps):
        return jnp.einsum("nc,nd->cd", ts, ps, preferred_element_type=jnp.float32)

    if n <= CM_CHUNK_PIXELS:
        return part(t_flat, p_flat).astype(jnp.int32)
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    for s in range(0, n, CM_CHUNK_PIXELS):
        cm = cm + part(
            t_flat[s : s + CM_CHUNK_PIXELS], p_flat[s : s + CM_CHUNK_PIXELS]
        ).astype(jnp.int32)
    return cm


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
    return _cm_matmul(t, p, num_classes, sample_valid)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix_update_sparse(labels, y_pred, num_classes: int, sample_valid=None):
    """Integer-label confusion-matrix update: labels (B, ...) int vs
    argmax(y_pred) — avoids the one-hot argmax round trip."""
    t = labels.astype(jnp.int32)
    p = jnp.argmax(y_pred, axis=-1)
    return _cm_matmul(t, p, num_classes, sample_valid)


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

    Per-step updates are LAZY: ``update_from_cm`` only stores the device
    array handle (no host-device sync), so the training loop never blocks
    on a step's outputs and async dispatch stays pipelined; the int64 host
    accumulation (int32 would overflow past ~2.1G pixels/class-pair within
    a VOC-Aug epoch) happens once at ``result()``.
    """

    def __init__(self, num_classes: int, accum_enable: bool = True):
        self.num_classes = num_classes
        self.accum_enable = accum_enable
        self.reset()

    def reset(self):
        import numpy as np

        self._total_cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        self._pending: list = []

    def update_state(self, y_true, y_pred):
        return self.update_from_cm(
            confusion_matrix_update(y_true, y_pred, self.num_classes)
        )

    def update_from_cm(self, cm):
        if self.accum_enable:
            self._pending.append(cm)
        else:
            self._pending = [cm]
            self._total_cm[:] = 0
        return self

    def _flush(self):
        import numpy as np

        for cm in self._pending:
            self._total_cm += np.asarray(cm, dtype=np.int64)
        self._pending = []

    @property
    def total_cm(self):
        self._flush()
        return self._total_cm

    def result(self) -> float:
        import numpy as np

        cm = self.total_cm.astype(np.float64)
        diag = np.diagonal(cm)
        denom = cm.sum(axis=0) + cm.sum(axis=1) - diag
        valid = denom > 0
        if not valid.any():
            return 0.0
        return float((diag[valid] / denom[valid]).mean())

    def per_class_iou(self):
        """Per-class IoU vector (NaN for classes never seen in truth or
        prediction — the classes MeanIoU's reduction skips).

        The reference's ``MeanIoUExt`` (semantic_segmentation.py:283-334)
        only exposes the mean; per-class values are what segmentation
        debugging actually needs (which classes drag the mean down), so
        this framework surfaces them from the same confusion matrix.
        """
        import numpy as np

        cm = self.total_cm.astype(np.float64)
        diag = np.diagonal(cm)
        denom = cm.sum(axis=0) + cm.sum(axis=1) - diag
        valid = denom > 0
        return np.where(valid, diag / np.where(valid, denom, 1.0), np.nan)

    def report(self, class_names=None) -> str:
        """Readable per-class IoU table + mean (one line per class)."""
        import numpy as np

        iou = self.per_class_iou()
        names = class_names or [str(i) for i in range(self.num_classes)]
        width = max(len(str(n)) for n in names)
        lines = []
        for i, v in enumerate(iou):
            val = "  n/a" if np.isnan(v) else f"{v:.4f}"
            lines.append(f"  {str(names[i]):<{width}}  {val}")
        lines.append(f"  {'mean':<{width}}  {self.result():.4f}")
        return "\n".join(lines)
