"""Parity-decomposed train tail: ×2-upsample → softmax → loss (+ CM)
without materializing any full-resolution tensor.

Reference tail (semantic_segmentation.py:904-909 upsample+softmax,
:438-447 loss, :310-334 metric): under boundary refinement the decoder's
final upsample factor is always ×2 (:899-902 — os/8 for os=16, os/4 for
os=8), so the training step computes ``loss(softmax(resize_×2(logits)))``
on a (B, S, S, C) tensor.  Profiling (tools/profile_step.py,
tools/resize_attribution.py) shows XLA lowering the resize to convolutions
plus layout copies that dominate the tail's cost over the loss's own
VPU-transcendental floor.

Half-pixel bilinear ×2 along one axis is a fixed 2-tap lerp per output
parity (verified ≤2.4e-7 against jax.image.resize):

    up[2k]   = 0.25·x[k−1] + 0.75·x[k]      (x[−1] ≡ x[0])
    up[2k+1] = 0.75·x[k]   + 0.25·x[k+1]    (x[H]  ≡ x[H−1])

so the full-res pixel grid partitions into FOUR low-res-sized parity
planes, each a 4-tap elementwise lerp of the logits.  Loss mean and
confusion matrix are sums over pixels, hence sums over parities: every
intermediate stays (B, S/2, S/2, C), XLA fuses the lerp into the
softmax+loss elementwise chain, and the backward differentiates shifts
(pure pads/slices) instead of a transposed resize convolution.

Numerics: per-pixel values match the two-step computation to fp rounding;
the reduction order differs (four plane sums vs one full-res mean) —
reassociation at the 1e-7 fp32 / 1e-16 fp64 level, bounded by tests/
test_parity_tail.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..train.loss import (
    masked_pixel_mean,
    per_pixel_loss_dense,
    per_pixel_loss_sparse,
)
from ..train.metrics import (
    confusion_matrix_update,
    confusion_matrix_update_sparse,
    empty_confusion_matrix,
)


def _shift_prev(x, axis: int):
    n = x.shape[axis]
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)],
        axis=axis,
    )


def _shift_next(x, axis: int):
    n = x.shape[axis]
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis),
         jax.lax.slice_in_dim(x, n - 1, n, axis=axis)],
        axis=axis,
    )


def upsample2_parities(x):
    """The four parity planes of ``tf_resize_images(x, 2, 2)``.

    x: (B, H, W, C).  Returns ``planes`` with
    ``planes[ph][pw] == tf_resize_images(x, 2, 2)[:, ph::2, pw::2, :]``
    (each (B, H, W, C)), to fp rounding.
    """
    e_h = 0.25 * _shift_prev(x, 1) + 0.75 * x
    o_h = 0.75 * x + 0.25 * _shift_next(x, 1)
    planes = []
    for base in (e_h, o_h):
        e_w = 0.25 * _shift_prev(base, 2) + 0.75 * base
        o_w = 0.75 * base + 0.25 * _shift_next(base, 2)
        planes.append((e_w, o_w))
    return planes


def tail_loss_cm(
    logits,
    label,
    pos_weights,
    neg_weights,
    num_classes: int,
    valid=None,
    epsilon: float = 1e-7,
):
    """(loss, cm) of the ×2-upsampled softmax output, parity-decomposed.

    Equals (to fp reassociation)::

        probs = softmax(tf_resize_images(logits, 2, 2))
        loss  = class_balanced_loss(label, probs, pw, nw, valid=valid)
        cm    = confusion_matrix_update(label, probs, num_classes, valid)

    logits: (B, H, W, C) pre-softmax decoder output at half resolution.
    label: one-hot (B, 2H, 2W, C) or integer (B, 2H, 2W) — each parity
    plane consumes the matching strided slice.  argmax∘softmax ≡ argmax,
    so the CM argmaxes the parity logits directly.
    """
    dense = label.ndim == logits.ndim
    per_pixel_sum = None
    cm = empty_confusion_matrix(num_classes)
    for ph, row in enumerate(upsample2_parities(logits)):
        for pw_, u in enumerate(row):
            lab = (
                label[:, ph::2, pw_::2, :] if dense else label[:, ph::2, pw_::2]
            )
            probs = jax.nn.softmax(u, axis=-1)
            if dense:
                pp = per_pixel_loss_dense(lab, probs, pos_weights, neg_weights, epsilon)
                cm = cm + confusion_matrix_update(lab, u, num_classes, valid)
            else:
                pp = per_pixel_loss_sparse(lab, probs, pos_weights, neg_weights, epsilon)
                cm = cm + confusion_matrix_update_sparse(lab, u, num_classes, valid)
            per_pixel_sum = pp if per_pixel_sum is None else per_pixel_sum + pp
    # per_pixel_sum is the sum over the 4 parities at each low-res site;
    # dividing by the FULL-RES pixel count gives the full-res mean.
    h, w = logits.shape[1], logits.shape[2]
    loss = masked_pixel_mean(per_pixel_sum, valid, total_pixels_per_sample=4 * h * w)
    return loss, cm
