"""Adam cross-check vs the actual ``tf.keras.optimizers.Adam``.

The reference compiles with ``optimizers.Adam(lr, beta_1=0.5, beta_2=0.99,
decay)`` (semantic_segmentation.py:477-480).  Keras applies ε to the
uncorrected √v with bias correction folded into the step size; this suite
pins our optimizer to the real Keras implementation to ≤1e-9 per step at
gradient magnitudes spanning the √v≈ε regime (g ∈ {0.5, 1e-6, 1e-8}) —
the regime where the previous ``optax.scale_by_adam``-based implementation
measurably diverged (VERDICT r2 item 2).

fp64 on both sides (tf.Variable float64, Keras floatx float64, jax x64 —
both restored after) so the tolerance tests the *formula*, not fp32
round-off.  β₂ is passed as ``float(np.float32(0.99))``: Keras routes the
β hypers through a float32 convert (``ops.cast(self.beta_2, dtype)`` on a
Python float), so float32(0.99) IS the value the fp32 reference trained
with; using the f32-representable value on both sides makes the remaining
comparison purely about ε placement and bias correction.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp
import optax

from deeplabv3plus_keras_tpu.config import HParams
from deeplabv3plus_keras_tpu.train import make_optimizer

pytestmark = pytest.mark.parity

LR, B1, B2 = 0.01, 0.5, float(np.float32(0.99))


@pytest.fixture
def fp64_everywhere():
    import keras

    old_floatx = tf.keras.backend.floatx()
    # set/restore BOTH floatx and the dtype policy: Keras 3 caches the
    # global policy at first materialization; set_floatx alone neither
    # upgrades nor downgrades it once cached
    tf.keras.backend.set_floatx("float64")
    keras.config.set_dtype_policy("float64")
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        tf.keras.backend.set_floatx(old_floatx)
        keras.config.set_dtype_policy(old_floatx)
        jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("g_mag", [0.5, 1e-6, 1e-8])
def test_adam_matches_tf_keras_per_step(g_mag, fp64_everywhere):
    hps = HParams(lr=LR, beta_1=B1, beta_2=B2, decay=0.0)
    tx = make_optimizer(hps)
    p = {"w": jnp.array([1.0, 2.0], jnp.float64)}
    g = {"w": jnp.array([g_mag, -g_mag], jnp.float64)}
    st = tx.init(p)

    var = tf.Variable([1.0, 2.0], dtype=tf.float64)
    opt = tf.keras.optimizers.Adam(
        learning_rate=LR, beta_1=B1, beta_2=B2, epsilon=1e-7
    )
    grad = tf.constant([g_mag, -g_mag], dtype=tf.float64)

    for step in range(1, 11):
        updates, st = tx.update(g, st, p)
        p = optax.apply_updates(p, updates)
        opt.apply_gradients([(grad, var)])
        np.testing.assert_allclose(
            np.asarray(p["w"]),
            var.numpy(),
            atol=1e-9,
            rtol=0,
            err_msg=f"g={g_mag} step={step}",
        )


def test_adam_decay_schedule_matches_legacy_formula(fp64_everywhere):
    """TF2.4's ``decay`` arg lowers lr by 1/(1+decay·iteration), iteration
    0-based (legacy optimizer_v2 ``_decayed_lr``; Keras 3 dropped the arg,
    so the oracle is the closed formula in fp64)."""
    decay = 0.25
    hps = HParams(lr=LR, beta_1=B1, beta_2=B2, decay=decay)
    tx = make_optimizer(hps)
    p = {"w": jnp.array([1.0], jnp.float64)}
    g = {"w": jnp.array([0.3], jnp.float64)}
    st = tx.init(p)

    theta, m, v = np.array([1.0]), np.zeros(1), np.zeros(1)
    grad = np.array([0.3])
    for t in range(1, 8):
        updates, st = tx.update(g, st, p)
        p = optax.apply_updates(p, updates)
        lr_t = LR / (1.0 + decay * (t - 1))
        m = B1 * m + (1 - B1) * grad
        v = B2 * v + (1 - B2) * grad**2
        alpha = lr_t * np.sqrt(1 - B2**t) / (1 - B1**t)
        theta = theta - alpha * m / (np.sqrt(v) + 1e-7)
        np.testing.assert_allclose(np.asarray(p["w"]), theta, atol=1e-12)
