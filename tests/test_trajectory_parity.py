"""Training-TRAJECTORY parity vs tf.keras: N optimizer steps, per-step loss.

Static parity (logits/loss/l2 value equality, test_full_model_parity.py)
cannot see optimizer or BN-update divergences.  This suite runs the
strongest real-data proxy the environment permits (VERDICT r2 item 1):
the reference's exact layer recipe built in Keras (KerasReferenceGraph),
weights transplanted into our flax model through the converter, then both
frameworks take 10 Adam steps on identical synthetic batches with the
reference's hypers (compile semantic_segmentation.py:785-787, fit
:1000-1009: lr=1e-4, Adam(β₁=0.5, β₂=0.99) + ClassBalancedLoss + l2
weight decay, all layers trainable, BN in training mode), asserting
per-step training loss agreement.

Two precisions, two claims:
- float64 (both sides end-to-end): pins the *dynamics formula*.  Measured
  profile: step 1 EXACT (rel 0.0), then ~8e-10/step of irreducible drift
  (8.4e-9 at step 10): for coordinates with √v≈0 the Adam update
  m/(√v+ε) has sensitivity α/ε ≈ 10⁷·lr to gradient noise, so even
  f64 autodiff op-order differences (~1e-13 relative) surface at 1e-9.
  Asserted ≤5e-8 — five orders below the 4e-3 divergence the old
  optax.scale_by_adam ε placement produced; any ε misplacement, BN-update
  or l2-gradient divergence fails loudly.  fp32 cannot make this claim:
  β₁=0.5 Adam is sign-like per parameter, so ε-scale gradient rounding
  flips whole ±lr·α update signs and amplifies single-ulp noise ~10³× by
  step 10 (measured) — in ANY two fp32 implementations, including TF vs
  itself across thread counts.
- float32 (the production dtype): bounds that chaos end-to-end; measured
  profile max 4.3e-4 relative (step 9), asserted ≤2e-3.

Dropout is rate 0 on both sides (the only stochastic layer; the reference
has no seed-matched dropout story across frameworks).  BN moving averages
update on both sides but never enter the train-mode loss, so the
trajectory is insensitive to the reference's double moving-stat update
from its two backbone runs (:930).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from test_full_model_parity import SIZE, WD, KerasReferenceGraph, _conf

pytestmark = pytest.mark.parity

LR = 1e-4  # reference conf.json:17
N_STEPS = 10
BATCH = 2


def tf_class_balanced_loss(y_true, y_pred):
    """TF transcription of train/loss.class_balanced_loss (reference
    :438-447): weighted per-class BCE, summed over classes, mean over
    batch+pixels; ε=1e-7; dtype follows Keras floatx."""
    from deeplabv3plus_keras_tpu.train.loss import SS_NW, SS_PW

    eps = 1e-7
    dt = tf.keras.backend.floatx()
    pw = tf.constant(SS_PW, dt)
    nw = tf.constant(SS_NW, dt)
    per_class = -(
        pw * y_true * tf.math.log(y_pred + eps)
        + nw * (1.0 - y_true) * tf.math.log(1.0 - y_pred + eps)
    )
    return tf.reduce_mean(tf.reduce_sum(per_class, axis=-1))


def tf_l2_penalty(ref):
    """wd·Σ‖W‖² over the 6 kernels the reference regularizes (:817, :838,
    :845, :866, :893, :931) — mirrors train/loss.l2_penalty's '_l2' tags."""
    ks = [ref.b0_conv, ref.b1_conv, ref.b2_conv, ref.proj_conv,
          ref.ref_conv, ref.cls_conv]
    return WD * tf.add_n([tf.reduce_sum(tf.square(l.kernel)) for l in ks])


def _run_both_trajectories(np_dtype, backbone="mobilenetv2"):
    """Returns [(ours, keras), ...] per-step training losses."""
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_train_step,
        create_train_state,
    )
    from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone

    conf = _conf(backbone)
    conf.nn_arch.dropout_rate = 0.0  # only stochastic layer; off on both sides
    conf.hps.lr = LR
    conf.hps.decay = 0.0
    conf.hps.dtype = np.dtype(np_dtype).name
    model, variables = init_model(conf, jax.random.PRNGKey(0))

    ref = KerasReferenceGraph(backbone)  # built under the caller's floatx
    rng = np.random.default_rng(11)
    warm = rng.uniform(-1, 1, (1, SIZE, SIZE, 3)).astype(np_dtype)
    ref(tf.constant(warm))  # build all eager layers before transplanting

    variables, r1 = convert_keras_backbone(ref.full_backbone, variables, base_path="base")
    assert not r1["missing"], r1["missing"][:5]
    variables, r2 = convert_keras_backbone(ref, variables, base_path="encoder")
    assert not r2["missing"], r2["missing"][:5]
    variables, r3 = convert_keras_backbone(ref, variables, base_path="decoder")
    assert not r3["missing"], r3["missing"][:5]

    # --- our side: jit'd train step over the transplanted state
    state, tx = create_train_state(conf, variables)
    train_step = jax.jit(build_train_step(model, tx, conf))
    step_rng = jax.random.PRNGKey(3)

    # --- Keras side: Adam with the reference hypers (:477-480)
    opt = tf.keras.optimizers.Adam(
        learning_rate=LR, beta_1=conf.hps.beta_1, beta_2=conf.hps.beta_2,
        epsilon=1e-7,
    )
    tvars = list(ref.base.trainable_variables)
    for layer in ref.layers:
        tvars += layer.trainable_variables

    losses = []
    eye = np.eye(21, dtype=np_dtype)
    for step in range(1, N_STEPS + 1):
        x = rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np_dtype)
        y = eye[rng.integers(0, 21, (BATCH, SIZE, SIZE))]
        batch = {
            "image": jnp.asarray(x),
            "label": jnp.asarray(y),
            "valid": jnp.ones((BATCH,), jnp.int32),
        }
        state, metrics = train_step(state, batch, step_rng)
        ours = float(metrics["loss"])

        xs, ys = tf.constant(x), tf.constant(y)
        with tf.GradientTape() as tape:
            probs = ref(xs, training=True)
            loss = tf_class_balanced_loss(ys, probs) + tf_l2_penalty(ref)
        grads = tape.gradient(loss, tvars)
        opt.apply_gradients(zip(grads, tvars))
        losses.append((ours, float(loss)))
    return losses


def _assert_trajectory(losses, rel_tol):
    history = [abs(a - b) / abs(b) for a, b in losses]
    for step, rel in enumerate(history, 1):
        assert rel <= rel_tol, (
            f"step {step}: loss {losses[step - 1][0]:.8f} vs keras "
            f"{losses[step - 1][1]:.8f} (rel {rel:.2e}); history "
            f"{['%.1e' % r for r in history]}"
        )


def test_train_trajectory_matches_tf_keras_fp64():
    import keras

    old_floatx = tf.keras.backend.floatx()
    # set BOTH floatx and the dtype policy: Keras 3 caches the global
    # policy at first materialization, and set_floatx alone neither
    # upgrades it here (layers would build f32 if an earlier test already
    # built any) nor downgrades it on teardown
    tf.keras.backend.set_floatx("float64")
    keras.config.set_dtype_policy("float64")
    jax.config.update("jax_enable_x64", True)
    try:
        losses = _run_both_trajectories(np.float64)
    finally:
        tf.keras.backend.set_floatx(old_floatx)
        keras.config.set_dtype_policy(old_floatx)
        jax.config.update("jax_enable_x64", False)
    _assert_trajectory(losses, 5e-8)


def test_train_trajectory_matches_tf_keras_fp32():
    losses = _run_both_trajectories(np.float32)
    _assert_trajectory(losses, 2e-3)


def test_train_trajectory_matches_tf_keras_fp32_xception():
    """The reference's other headline backbone (README title): same
    10-step dynamics check through Xception's sepconv/BN stack."""
    losses = _run_both_trajectories(np.float32, backbone="xception")
    _assert_trajectory(losses, 2e-3)
