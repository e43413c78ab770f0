"""Tests for the on-device preprocessing pipeline vs the host (SciPy)
reference path (reference semantic_segmentation.py:1515-1560)."""

import numpy as np

from deeplabv3plus_keras_tpu.ops import (
    clamp_label,
    host_prepare_sample,
    normalize_image,
    one_hot,
    prepare_batch,
)


def test_normalize_range():
    x = np.array([[[0, 127.5, 255]]], dtype=np.float32)
    out = np.asarray(normalize_image(x))
    np.testing.assert_allclose(out, [[[-1.0, 0.0, 1.0]]], atol=1e-6)


def test_clamp_label_maps_ignore_to_background():
    lab = np.array([[0, 20, 21, 255]], dtype=np.uint8)
    out = np.asarray(clamp_label(lab, 21))
    np.testing.assert_array_equal(out, [[0, 20, 0, 0]])


def test_one_hot_shapes_and_values(rng):
    lab = rng.integers(0, 21, size=(8, 8)).astype(np.int32)
    oh = np.asarray(one_hot(lab, 21))
    assert oh.shape == (8, 8, 21)
    np.testing.assert_array_equal(oh.argmax(-1), lab)
    np.testing.assert_allclose(oh.sum(-1), 1.0)
    # trailing singleton axis accepted ((H,W,1) input like the reference's)
    oh2 = np.asarray(one_hot(lab[..., None], 21))
    np.testing.assert_array_equal(oh2, oh)


def test_prepare_batch_matches_host_path(rng):
    size, C = 96, 21
    canvas_hw = 128
    shapes = [(100, 128), (128, 75), (96, 96)]
    B = len(shapes)
    img_canvas = np.zeros((B, canvas_hw, canvas_hw, 3), np.uint8)
    lab_canvas = np.zeros((B, canvas_hw, canvas_hw), np.uint8)
    sizes = np.zeros((B, 2), np.int32)
    raw = []
    for i, (h, w) in enumerate(shapes):
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        # Piecewise-constant labels (like real segmentation masks, incl.
        # ids > 20 to exercise the clamp); per-pixel random labels would make
        # every pixel an interpolation-tie boundary.
        blocky = rng.integers(0, 32, size=(h // 8 + 1, w // 8 + 1)).astype(np.uint8)
        lab = np.repeat(np.repeat(blocky, 8, axis=0), 8, axis=1)[:h, :w]
        img_canvas[i, :h, :w] = img
        lab_canvas[i, :h, :w] = lab
        sizes[i] = (h, w)
        raw.append((img, lab))

    images, labels = prepare_batch(
        img_canvas, sizes, lab_canvas, size=size, num_classes=C
    )
    images, labels = np.asarray(images), np.asarray(labels)
    assert images.shape == (B, size, size, 3)
    assert labels.shape == (B, size, size, C)

    for i, (img, lab) in enumerate(raw):
        ref_img, ref_oh = host_prepare_sample(img, lab, size, C)
        np.testing.assert_allclose(images[i], ref_img, atol=1e-4)
        # Labels: bilinear-resampled class ids can differ by rounding ties at
        # class boundaries; demand near-total agreement.
        agree = (labels[i].argmax(-1) == ref_oh.argmax(-1)).mean()
        assert agree > 0.99, f"sample {i}: one-hot agreement {agree}"
