"""Pallas kernel tests (run interpreted on the CPU backend; the same code
compiles via Mosaic on TPU — validated by the TPU smoke scripts/bench)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import numpy as np

import jax.numpy as jnp

from deeplabv3plus_keras_tpu.kernels import upsample_argmax, upsample_argmax_reference



@pytest.mark.parametrize("scale", [1, 2, 4, 8, 16])
def test_upsample_argmax_matches_resize_argmax(rng, scale):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 21)), jnp.float32)
    a = np.asarray(upsample_argmax(x, scale))
    b = np.asarray(upsample_argmax_reference(x, scale))
    assert a.shape == (2, 8 * scale, 8 * scale)
    np.testing.assert_array_equal(a, b)


def test_upsample_argmax_tie_break_first_index():
    # equal logits everywhere → argmax must be class 0 (first max), as
    # jnp.argmax does.
    x = jnp.zeros((1, 4, 4, 7), jnp.float32)
    out = np.asarray(upsample_argmax(x, 2))
    assert (out == 0).all()


def test_upsample_argmax_odd_channels_and_sizes(rng):
    x = jnp.asarray(rng.normal(size=(3, 5, 7, 11)), jnp.float32)
    a = np.asarray(upsample_argmax(x, 4))
    b = np.asarray(upsample_argmax_reference(x, 4))
    np.testing.assert_array_equal(a, b)


def test_tap_major_conv_matches_lax_conv(rng):
    import jax

    from deeplabv3plus_keras_tpu.kernels.tap_major_conv import (
        tap_major_conv3x3_same,
    )

    x = jnp.asarray(rng.normal(size=(2, 12, 12, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 16, 7)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(
        np.asarray(tap_major_conv3x3_same(x, k)), np.asarray(ref), atol=1e-4
    )
    g1 = jax.grad(lambda k: jnp.sum(jnp.sin(tap_major_conv3x3_same(x, k))))(k)
    g2 = jax.grad(
        lambda k: jnp.sum(
            jnp.sin(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
            )
        )
    )(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)
