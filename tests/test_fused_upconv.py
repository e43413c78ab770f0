"""Fused upsample×f + conv3×3 must equal the two-step computation exactly
(values AND gradients) — it replaces the decoder's hottest memory path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deeplabv3plus_keras_tpu.ops.fused_upconv import _plain, upsample_conv3


@pytest.mark.parametrize("f,n", [(2, 4), (4, 6), (8, 6), (8, 32), (4, 5)])
def test_fused_matches_two_step(rng, f, n):
    C, O = 7, 5
    x = jnp.asarray(rng.normal(size=(2, n, n + 1, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, C, O)), jnp.float32)
    ref = _plain(x, w, f)
    out = upsample_conv3(x, w, f)
    assert out.shape == ref.shape == (2, f * n, f * (n + 1), O)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gradients_match(rng):
    f, n, C, O = 8, 6, 4, 3
    x = jnp.asarray(rng.normal(size=(1, n, n, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, C, O)), jnp.float32)

    def loss_plain(x, w):
        return jnp.sum(jnp.sin(_plain(x, w, f)))

    def loss_fused(x, w):
        return jnp.sum(jnp.sin(upsample_conv3(x, w, f)))

    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_p), atol=2e-4)


def test_tiny_input_falls_back(rng):
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(upsample_conv3(x, w, 8)),
        np.asarray(_plain(x, w, 8)),
        atol=1e-6,
    )
