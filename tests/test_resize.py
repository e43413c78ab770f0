"""Parity tests for the resize kernels against SciPy ground truth
(reference data-path semantics, semantic_segmentation.py:130-280)."""

import numpy as np
import pytest
from scipy import ndimage

from deeplabv3plus_keras_tpu.ops import affine_resize, resize_symmetric
from deeplabv3plus_keras_tpu.ops.resize import symmetric_geometry


def scipy_resize(image, out_h, out_w, mode):
    m = np.eye(4)
    m[0, 0] = image.shape[0] / float(out_h)
    m[1, 1] = image.shape[1] / float(out_w)
    return ndimage.affine_transform(
        image, m[0:3], order=1, output_shape=(out_h, out_w, image.shape[2]), mode=mode
    )


@pytest.mark.parametrize("shape,out", [
    ((37, 53, 3), (64, 64)),
    ((64, 64, 3), (32, 48)),
    ((100, 50, 1), (50, 100)),
])
@pytest.mark.parametrize("mode", ["nearest", "constant"])
def test_affine_resize_matches_scipy_float(rng, shape, out, mode):
    img = rng.uniform(-1, 1, size=shape).astype(np.float32)
    ours = np.asarray(affine_resize(img, out[0], out[1], mode=mode))
    ref = scipy_resize(img.astype(np.float64), out[0], out[1], mode)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_affine_resize_uint8_rounding(rng):
    img = rng.integers(0, 21, size=(33, 47, 1)).astype(np.uint8)
    ours = np.asarray(affine_resize(img, 64, 64, mode="nearest"))
    ref = scipy_resize(img, 64, 64, "nearest")
    # scipy rounds interpolated values back to uint8; allow off-by-one on
    # exact-half ties only.
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert (diff <= 1).all()
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize("h,w", [(375, 500), (500, 375), (500, 500), (123, 457)])
def test_symmetric_geometry_matches_reference_rules(h, w):
    size = 224
    h_p, w_p, pad_t, pad_l, pad_b, pad_r = symmetric_geometry(h, w, size)
    if w >= h:
        assert w_p == size and h_p == int(h / w * size)
        pad = size - h_p
        assert pad_t == pad // 2 and pad_b == pad - pad // 2  # extra bottom
        assert pad_l == pad_r == 0
    else:
        assert h_p == size and w_p == int(w / h * size)
        pad = size - w_p
        # applied pads: extra column on the LEFT (reference :266 quirk)
        assert pad_l == pad - pad // 2 and pad_r == pad // 2
    assert h_p + pad_t + pad_b == size or w_p + pad_l + pad_r == size


def test_resize_symmetric_full_parity_with_scipy(rng):
    """End-to-end parity vs a straight transcription of the reference
    resize_image_to_target_symmeric_size on a landscape and portrait image."""
    for shape in [(375, 500, 3), (500, 311, 3)]:
        img = rng.uniform(-1, 1, size=shape).astype(np.float32)
        size = 224
        ours, w, h, pad_t, pad_l, pad_b, pad_r = resize_symmetric(img, size)
        ours = np.asarray(ours)

        # Reference transcription:
        hh, ww = shape[0], shape[1]
        if ww >= hh:
            w_p, h_p = size, int(hh / ww * size)
            pad = size - h_p
            t, b = pad // 2, pad // 2 + (pad % 2)
            ref = scipy_resize(img.astype(np.float64), h_p, w_p, "nearest")
            ref = np.pad(ref, ((t, b), (0, 0), (0, 0)))
            assert (pad_t, pad_b) == (t, b)
        else:
            h_p, w_p = size, int(ww / hh * size)
            pad = size - w_p
            l, r = pad // 2, pad // 2 + (pad % 2)
            ref = scipy_resize(img.astype(np.float64), h_p, w_p, "nearest")
            ref = np.pad(ref, ((0, 0), (r, l), (0, 0)))  # reference swap :266
            assert (pad_l, pad_r) == (l, r)  # reported, not applied, values
        # fp32 kernel vs fp64 scipy reference
        np.testing.assert_allclose(ours, ref, atol=2e-4)
        assert (w, h) == (ww, hh)


@pytest.mark.parametrize("shape,factors", [
    ((2, 2, 2, 256), (16, 16)),   # pyramid-pooling scale (Xception ASPP)
    ((1, 3, 5, 7), (4, 2)),       # ragged dims, asymmetric factors
    ((2, 32, 32, 21), (2, 2)),    # decoder-logits scale
])
def test_tf_resize_matmul_matches_image_resize(rng, shape, factors):
    """The interpolation-matrix form must reproduce jax.image.resize
    (= K.resize_images half-pixel bilinear) exactly: its operator rows ARE
    the resize weights, applied as the same <=2-tap multiply-adds."""
    import jax.numpy as jnp

    from deeplabv3plus_keras_tpu.ops.resize import (
        tf_resize_images,
        tf_resize_images_matmul,
    )

    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ref = tf_resize_images(x, *factors)
    out = tf_resize_images_matmul(x, *factors)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    xb = x.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(tf_resize_images_matmul(xb, *factors), np.float32),
        np.asarray(tf_resize_images(xb, *factors), np.float32),
        atol=2e-2,
    )
