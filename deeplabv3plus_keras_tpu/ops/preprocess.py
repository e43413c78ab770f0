"""Image/label preprocessing.

Replaces the reference's dual SciPy(CPU)/CuPy(GPU) preprocessing path
(semantic_segmentation.py:130-280, selected per-sample by ``prepro_device``,
conf.json:8) and the per-pixel Python one-hot loop (:337-362) with a single
jit-compiled TPU pipeline operating on fixed-size canvases.

Pipeline contract (all static shapes, content dynamic → one XLA compilation):

    host:   decode JPEG/PNG → paste into (CANVAS, CANVAS) uint8 buffer,
            record true (h, w)
    device: corner-anchored bilinear scale of the long side to ``size``
            (scipy semantics, clamp boundary), symmetric zero-pad with the
            reference's odd-pad quirks, (−1, 1) normalization
            (2*(x/255−0.5), reference :1720), label id clamp
            ``label[label > C-1] = 0`` (reference :1734 — maps the VOC
            ignore-id 255 to background, mirrored for mIoU comparability),
            vectorized one-hot (replacing the Python loop :357-358).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .resize import symmetric_geometry


def normalize_image(image):
    """(−1, 1) normalization: ``2*(x/255 − 0.5)`` (reference :1720, :1760)."""
    return 2.0 * (jnp.asarray(image, jnp.float32) / 255.0 - 0.5)


def clamp_label(label, num_classes: int):
    """``label[label > num_classes-1] = 0`` (reference :1734, :1546)."""
    label = jnp.asarray(label)
    return jnp.where(label > num_classes - 1, 0, label)


def one_hot(label, num_classes: int):
    """Vectorized one-hot of an (H, W) or (H, W, 1) int label → (H, W, C).

    Replaces the reference's O(H·W) Python loop ``get_one_hot``
    (semantic_segmentation.py:337-362); the reference variant keeps a
    trailing singleton axis from its (H, W, 1) input — here the clean
    (H, W, C) layout is produced (SURVEY §2.3).
    """
    label = jnp.asarray(label)
    if label.ndim == 3 and label.shape[-1] == 1:
        label = label[..., 0]
    return jax.nn.one_hot(label, num_classes, dtype=jnp.float32)


def _dynamic_axis_sample(canvas_len: int, out_size: int, in_size, target_len):
    """Corner-anchored bilinear gather indices/weights for one axis where
    the true extent ``in_size`` and scaled extent ``target_len`` are traced
    but the buffer sizes are static.

    Positions >= target_len are dead (they will be masked by the pad step);
    their indices are clamped to keep gathers in range.
    """
    scale = in_size.astype(jnp.float32) / jnp.maximum(target_len, 1).astype(jnp.float32)
    src = jnp.arange(out_size, dtype=jnp.float32) * scale
    i0f = jnp.floor(src)
    w1 = src - i0f
    last = in_size - 1
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, last)
    i1 = jnp.clip(i0.astype(jnp.int32) + 1, 0, last)
    i0 = jnp.clip(i0, 0, canvas_len - 1)
    i1 = jnp.clip(i1, 0, canvas_len - 1)
    return i0, i1, w1


def _resize_pad_canvas(canvas, h, w, size: int):
    """Resize the (h, w) region of a fixed canvas to the symmetric target.

    Exact dynamic-shape analogue of ``resize_image_to_target_symmeric_size``
    (reference :200-280): long side → ``size`` (corner-anchored bilinear,
    clamp boundary), short side truncated scale, zero pad split with the
    extra row at the bottom / extra column at the LEFT (:230-233 vs :266).

    canvas: (CH, CW, C) float32. Returns (size, size, C) float32.
    """
    ch, cw = canvas.shape[0], canvas.shape[1]
    h_p, w_p, pad_t, pad_l, _pad_b, _pad_r = symmetric_geometry(h, w, size)

    y0, y1, wy = _dynamic_axis_sample(ch, size, h, h_p)
    x0, x1, wx = _dynamic_axis_sample(cw, size, w, w_p)

    top = canvas[y0]
    bot = canvas[y1]
    col = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
    left = col[:, x0]
    right = col[:, x1]
    resized = left * (1.0 - wx)[None, :, None] + right * wx[None, :, None]

    # Shift content by (pad_t, pad_l) and zero outside the valid region.
    rows = jnp.arange(size)[:, None]
    cols = jnp.arange(size)[None, :]
    src_r = jnp.clip(rows - pad_t, 0, size - 1)
    src_c = jnp.clip(cols - pad_l, 0, size - 1)
    shifted = resized[src_r.squeeze(-1)][:, src_c.squeeze(0)]
    valid = (
        (rows >= pad_t)
        & (rows < pad_t + h_p)
        & (cols >= pad_l)
        & (cols < pad_l + w_p)
    )
    return shifted * valid[:, :, None]


@functools.partial(
    jax.jit, static_argnames=("size", "num_classes", "with_labels", "one_hot_labels")
)
def prepare_batch(
    image_canvas,
    image_sizes,
    label_canvas=None,
    *,
    size: int,
    num_classes: int = 21,
    with_labels: bool = True,
    one_hot_labels: bool = True,
):
    """On-device batched preprocessing.

    image_canvas: (B, CH, CW, 3) uint8 raw pixels pasted at the origin.
    image_sizes:  (B, 2) int32 true (h, w) per sample.
    label_canvas: (B, CH, CW) uint8 label ids (or None).

    Returns (images (B, size, size, 3) float32 in (−1,1),
             labels — one-hot (B, size, size, num_classes), or int32
             (B, size, size) when ``one_hot_labels=False`` (the sparse
             training path; see train/loss.class_balanced_loss_sparse) —
             or None).
    """
    def per_image(canvas, hw):
        img = normalize_image(canvas)
        return _resize_pad_canvas(img, hw[0], hw[1], size)

    images = jax.vmap(per_image)(image_canvas, image_sizes)

    labels = None
    if with_labels and label_canvas is not None:
        def per_label(canvas, hw):
            # Clamp ids BEFORE resize (reference :1734), bilinear-resize the
            # integer label through float with rounding (scipy uint8
            # round-trip, reference resize on uint8 label :1739-1743),
            # clamp again (:1744), then one-hot.
            lab = clamp_label(canvas, num_classes).astype(jnp.float32)
            lab = _resize_pad_canvas(lab[..., None], hw[0], hw[1], size)[..., 0]
            lab = jnp.rint(lab).astype(jnp.int32)
            lab = clamp_label(lab, num_classes)
            return one_hot(lab, num_classes) if one_hot_labels else lab

        labels = jax.vmap(per_label)(label_canvas, image_sizes)
    return images, labels


@functools.partial(
    jax.jit, static_argnames=("size", "num_classes", "with_labels", "one_hot_labels")
)
def prepare_batch_from_cache(
    data_img,
    data_lab,
    data_sizes,
    idx,
    valid,
    *,
    size: int,
    num_classes: int = 21,
    with_labels: bool = True,
    one_hot_labels: bool = True,
):
    """HBM-resident-dataset batch: gather ``idx`` rows from the device
    arrays (data_img (N, CH, CW, 3) u8, data_lab (N, CH, CW) u8 | None,
    data_sizes (N, 2) i32) then run the standard preprocessing — epochs
    against a cached dataset move ZERO image bytes host→device (only the
    (B,) index and validity vectors cross).

    Rows where ``valid`` is 0 (the padded epoch tail) are zeroed with
    sizes (1, 1), EXACTLY like the streaming path's pre-zeroed canvases:
    tail batches then produce identical BN batch statistics, so training
    histories are bit-compatible between the two paths."""
    v = valid.astype(jnp.uint8)
    img = jnp.take(data_img, idx, axis=0) * v[:, None, None, None]
    sizes = jnp.where(
        v[:, None].astype(bool), jnp.take(data_sizes, idx, axis=0), 1
    )
    lab = (
        jnp.take(data_lab, idx, axis=0) * v[:, None, None]
        if (with_labels and data_lab is not None)
        else None
    )
    return prepare_batch(
        img,
        sizes,
        lab,
        size=size,
        num_classes=num_classes,
        with_labels=with_labels,
        one_hot_labels=one_hot_labels,
    )


# ---------------------------------------------------------------------------
# Host (NumPy/SciPy) reference path — used for parity tests and as the
# ``prepro_device == DEVICE_CPU`` fallback, mirroring the reference CPU path.
# ---------------------------------------------------------------------------

def host_symmetric_downscale(image, label, size: int, num_classes: int | None = None):
    """Host-side symmetric resize of an oversized image to its final
    (h_p, w_p) geometry for network size ``size`` — the reference's
    resize-anything semantics (semantic_segmentation.py:200-280) for inputs
    larger than the host canvas (e.g. Open Images photos >1024px).

    The long side lands exactly on ``size``, so the on-device kernel's
    subsequent corner-anchored resize has scale 1.0 and becomes an exact
    identity gather: the composed pipeline equals a single reference-style
    resize of the original.  The only divergence from a one-shot float path
    is the uint8 rounding of the pasted canvas (≤0.5/127.5 ≈ 4e-3 after
    normalization).  Labels are clamped before the resize (reference :1734)
    and rounded after, exactly as the device kernel does.

    image: (H, W, 3) uint8; label: (H, W) uint8 | None.
    Returns (image (h_p, w_p, 3) uint8, label (h_p, w_p) uint8 | None).
    """
    import numpy as np
    from scipy import ndimage

    h, w = image.shape[0], image.shape[1]
    h_p, w_p, *_ = symmetric_geometry(h, w, size)

    def scipy_resize(arr):
        m = np.eye(4)
        m[0, 0] = arr.shape[0] / float(h_p)
        m[1, 1] = arr.shape[1] / float(w_p)
        return ndimage.affine_transform(
            arr, m[0:3], order=1, output_shape=(h_p, w_p, arr.shape[2]), mode="nearest"
        )

    img = scipy_resize(np.asarray(image, np.float64))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    lab_out = None
    if label is not None:
        lab = np.asarray(label, np.float64)
        if num_classes is not None:
            lab = np.where(lab > num_classes - 1, 0.0, lab)
        lab = scipy_resize(lab[..., None])[..., 0]
        lab_out = np.rint(lab).clip(0, 255).astype(np.uint8)
    return img, lab_out


def host_prepare_sample(image, label, size: int, num_classes: int = 21):
    """Exact host-side mirror of the reference per-sample pipeline
    (semantic_segmentation.py:1515-1560): normalize → symmetric resize/pad;
    label: clamp → resize → clamp → one-hot.
    """
    import numpy as np
    from scipy import ndimage

    def scipy_symmetric(arr):
        h, w = arr.shape[0], arr.shape[1]
        h_p, w_p, pad_t, pad_l, pad_b, pad_r = symmetric_geometry(h, w, size)
        m = np.eye(4)
        m[0, 0] = h / float(h_p)
        m[1, 1] = w / float(w_p)
        out = ndimage.affine_transform(
            arr, m[0:3], order=1, output_shape=(h_p, w_p, arr.shape[2]), mode="nearest"
        )
        return np.pad(out, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)))

    image = 2.0 * (np.asarray(image, np.float64) / 255.0 - 0.5)
    image = scipy_symmetric(image).astype(np.float32)

    onehot = None
    if label is not None:
        label = np.asarray(label)
        if label.ndim == 2:
            label = label[..., None]
        label = label.copy()
        label[label > num_classes - 1] = 0
        label = scipy_symmetric(label)
        label[label > num_classes - 1] = 0
        lab = label[..., 0].astype(np.int64)
        onehot = np.eye(num_classes, dtype=np.float32)[lab]
    return image, onehot
