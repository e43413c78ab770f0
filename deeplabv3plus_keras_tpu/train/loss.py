"""Class-balanced per-pixel loss + class-weight computation.

Reference: ``class_balanced_loss`` (semantic_segmentation.py:438-447),
``ClassBalancedLoss`` wrapper (:423-435), legacy closure (:410-420), the
hard-coded VOC-Aug class-frequency weights ``ss_pw``/``ss_nw`` (:120-127),
and the offline weight computation ``cal_ss_class_imbalance_weights``
(:365-407).

The loss is a per-class weighted binary cross-entropy over softmax
probabilities, summed over classes and mean-reduced over batch/pixels:

    L = mean_{b,h,w}  Σ_i −[ pw_i · y_i · log(ŷ_i + ε)
                           + nw_i · (1 − y_i) · log(1 − ŷ_i + ε) ]

Weight-decay parity: Keras ``kernel_regularizer=l2(wd)`` adds
``wd · Σ‖W‖²`` to the training loss for the specific conv kernels listed in
models/blocks.py; ``l2_penalty`` reproduces that for params whose path
contains an ``_l2``-suffixed module name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Per-class positive/negative pixel-frequency weights over Pascal VOC 2012
# Aug (21 classes), precomputed offline by the reference's analysis notebook
# via cal_ss_class_imbalance_weights and hard-coded at
# semantic_segmentation.py:120-127.  pw = 1 − freq(class), nw = freq(class).
SS_PW = np.array([
    0.29754999, 0.99106889, 0.99236374, 0.99122957, 0.99350396, 0.99455487,
    0.98728424, 0.98090446, 0.96883489, 0.98753125, 0.99376389, 0.98942612,
    0.97222875, 0.99080578, 0.98845309, 0.92606652, 0.99393374, 0.99374322,
    0.98782171, 0.98659656, 0.99233476,
], dtype=np.float32)
SS_NW = (1.0 - SS_PW).astype(np.float32)


def per_pixel_loss_dense(y_true, y_pred, pos_weights, neg_weights, epsilon=1e-7):
    """The (B, H, W) per-pixel loss term (one-hot labels), in ≥fp32.

    Shared by ``class_balanced_loss`` and the parity-decomposed tail
    (ops/parity_tail.py), so both paths compute identical per-pixel values.
    """
    # ≥fp32 accumulation: bf16/f16 probs promote to f32; f64 (the fp64
    # trajectory-parity suite) stays f64.
    dt = jnp.promote_types(jnp.result_type(y_pred), jnp.float32)
    pw = jnp.asarray(pos_weights, dt)
    nw = jnp.asarray(neg_weights, dt)
    y_true = y_true.astype(dt)
    y_pred = y_pred.astype(dt)
    per_class = -(
        pw * y_true * jnp.log(y_pred + epsilon)
        + nw * (1.0 - y_true) * jnp.log(1.0 - y_pred + epsilon)
    )
    return jnp.sum(per_class, axis=-1)  # (B, H, W)


def masked_pixel_mean(per_pixel, valid, total_pixels_per_sample=None):
    """Mean of per-pixel losses over valid samples (``valid`` (B,) 0/1 or
    None = all).  ``total_pixels_per_sample`` overrides the per-sample
    pixel count in the denominator — the parity tail passes the FULL-RES
    count while summing quarter-res planes."""
    dt = jnp.result_type(per_pixel)
    n_pix = total_pixels_per_sample or per_pixel[0].size
    if valid is None:
        b = per_pixel.shape[0]
        return jnp.sum(per_pixel) / jnp.asarray(b * n_pix, dt)
    v = valid.astype(dt).reshape((-1,) + (1,) * (per_pixel.ndim - 1))
    denom = jnp.maximum(v.sum() * n_pix, 1.0)
    return jnp.sum(per_pixel * v) / denom


def class_balanced_loss(
    y_true,
    y_pred,
    pos_weights=SS_PW,
    neg_weights=SS_NW,
    epsilon: float = 1e-7,
    valid=None,
):
    """Weighted per-class BCE, summed over classes, mean over the rest.

    y_true: one-hot (B, H, W, C); y_pred: probabilities (B, H, W, C).
    ``valid``: optional (B,) 0/1 mask — the mean runs over valid samples
    only (static-shape replacement for the reference's ragged last batch).
    """
    per_pixel = per_pixel_loss_dense(y_true, y_pred, pos_weights, neg_weights, epsilon)
    if valid is None:
        return jnp.mean(per_pixel)
    return masked_pixel_mean(per_pixel, valid)


def class_balanced_loss_sparse(
    labels,
    y_pred,
    pos_weights=SS_PW,
    neg_weights=SS_NW,
    epsilon: float = 1e-7,
    valid=None,
):
    """Integer-label form of ``class_balanced_loss`` — identical numerics
    without ever storing a (B, H, W, C) one-hot label tensor in HBM.

    With t the true class and p the probabilities, the per-pixel loss
    −Σ_i [pw_i·y_i·log(p_i+ε) + nw_i·(1−y_i)·log(1−p_i+ε)] collapses to

        −[ pw_t·log(p_t+ε) + Σ_i nw_i·log(1−p_i+ε) − nw_t·log(1−p_t+ε) ].

    TPU note: p_t is contracted against an on-the-fly iota-compare one-hot
    rather than gathered with ``take_along_axis`` — differentiating the
    gather emits a serialized scatter-add on TPU (measured +66 ms per
    8×512² batch, PERFORMANCE.md), while the contraction's backward is a
    dense fused elementwise expression, making the sparse path as fast as
    the dense one at ~21× less label HBM.

    labels: (B, H, W) int; y_pred: (B, H, W, C) probabilities.
    """
    per_pixel = per_pixel_loss_sparse(labels, y_pred, pos_weights, neg_weights, epsilon)
    if valid is None:
        return jnp.mean(per_pixel)
    return masked_pixel_mean(per_pixel, valid)


def per_pixel_loss_sparse(labels, y_pred, pos_weights, neg_weights, epsilon=1e-7):
    """The (B, H, W) per-pixel loss term (integer labels), in ≥fp32.
    See ``class_balanced_loss_sparse`` for the collapsed formula."""
    dt = jnp.promote_types(jnp.result_type(y_pred), jnp.float32)
    pw = jnp.asarray(pos_weights, dt)
    nw = jnp.asarray(neg_weights, dt)
    p = y_pred.astype(dt)
    t = labels.astype(jnp.int32)

    log1m = jnp.log(1.0 - p + epsilon)
    neg_sum = jnp.einsum("...c,c->...", log1m, nw)  # Σ_i nw_i·log(1−p_i+ε)
    onehot_t = jax.nn.one_hot(t, p.shape[-1], dtype=dt)  # fused, transient
    p_t = jnp.sum(onehot_t * p, axis=-1)
    log1m_t = jnp.log(1.0 - p_t + epsilon)
    return -(pw[t] * jnp.log(p_t + epsilon) + neg_sum - nw[t] * log1m_t)


def l2_penalty(params, weight_decay: float):
    """``wd · Σ‖W‖²`` over conv kernels Keras regularizes (path has '_l2')."""
    if weight_decay == 0.0:
        return 0.0
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if any("_l2" in getattr(k, "key", "") for k in path):
            acc = jnp.promote_types(jnp.result_type(leaf), jnp.float32)
            total = total + jnp.sum(jnp.square(leaf.astype(acc)))
    return weight_decay * total


def compute_class_balance_weights(label_paths, num_classes: int = 21):
    """Offline class-imbalance weight computation.

    Vectorized replacement for the reference's
    ``cal_ss_class_imbalance_weights`` (semantic_segmentation.py:365-407),
    which looped a Python one-hot per pixel: here a single ``np.bincount``
    per label image.  Ids > num_classes−1 are clamped to 0 first, as there.

    label_paths: iterable of label-PNG file paths.
    Returns (pw, nw) arrays of shape (num_classes,).
    """
    from PIL import Image

    counts = np.zeros(num_classes, np.int64)
    total = 0
    for p in label_paths:
        lab = np.asarray(Image.open(p))
        lab = np.where(lab > num_classes - 1, 0, lab)
        counts += np.bincount(lab.ravel(), minlength=num_classes)
        total += lab.size
    freq = counts / max(total, 1)
    pw = (1.0 - freq).astype(np.float32)
    nw = freq.astype(np.float32)
    return pw, nw
