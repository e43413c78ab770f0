"""Fit-loop callback dynamics vs the REAL tf.keras callbacks.

Trajectory parity (test_trajectory_parity.py) pins the per-step Adam/BN/l2
dynamics; epoch bookkeeping is pinned at VOC-Aug cardinality
(test_epoch_bookkeeping.py).  The remaining fit-loop machinery the
reference delegates to Keras is its two enabled callbacks
(semantic_segmentation.py:978-986):

- ``ReduceLROnPlateau(monitor='loss', factor=reduce_lr_factor, patience=5,
  min_lr=1e-8)`` — ported in train/callbacks.py and driven by api.train()
  on the epoch-mean train loss;
- ``ModelCheckpoint(monitor='val_loss', save_best_only=True)`` — ported as
  train/checkpoint.save_checkpoint's best-val retention, driven on the
  epoch-mean val loss.

These tests drive the REAL Keras callback objects (not transcriptions of
their logic) with the same monitored-value sequences as our ports and
assert decision-for-decision agreement: the LR after every epoch, and the
exact set of epochs on which a checkpoint is written.  Keras semantics
worth pinning: the plateau improvement test is STRICT less with a default
``min_delta=1e-4`` margin (``np.less(current, best - min_delta)``), the
reduction is ``max(lr*factor, min_lr)``, and ModelCheckpoint's best test is
strict ``np.less`` with no margin (ties do NOT save).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from deeplabv3plus_keras_tpu.train.callbacks import ReduceLROnPlateau

pytestmark = pytest.mark.parity

PATIENCE = 5  # reference :980
MIN_LR = 1e-8  # reference :981


def _keras_lr_trace(losses, factor, lr0):
    """Drive the real tf.keras ReduceLROnPlateau; return LR after each epoch."""
    model = tf.keras.Sequential([tf.keras.layers.Dense(1)])
    model.build((None, 1))
    model.compile(optimizer=tf.keras.optimizers.Adam(learning_rate=lr0), loss="mse")
    cb = tf.keras.callbacks.ReduceLROnPlateau(
        monitor="loss", factor=factor, patience=PATIENCE, min_lr=MIN_LR
    )
    cb.set_model(model)
    cb.on_train_begin()
    trace = []
    for epoch, loss in enumerate(losses):
        cb.on_epoch_end(epoch, {"loss": float(loss)})
        trace.append(float(model.optimizer.learning_rate))
    return trace


def _our_lr_trace(losses, factor, lr0):
    plateau = ReduceLROnPlateau(factor, patience=PATIENCE, min_lr=MIN_LR)
    lr, trace = lr0, []
    for loss in losses:
        lr = plateau.update(float(loss), lr)
        trace.append(lr)
    return trace


def _assert_lr_parity(losses, factor, lr0=1e-4):
    ours = _our_lr_trace(losses, factor, lr0)
    keras = _keras_lr_trace(losses, factor, lr0)
    for ep, (a, b) in enumerate(zip(ours, keras)):
        # Keras stores LR in a float32 Variable; ours is a python float —
        # each reduction rounds once on the Keras side.
        assert a == pytest.approx(b, rel=1e-5), (
            f"epoch {ep}: ours {a:.10e} vs keras {b:.10e} "
            f"(losses[:ep+1]={losses[: ep + 1]})"
        )


def test_plateau_matches_keras_on_random_walks():
    rng = np.random.default_rng(7)
    for factor in (0.5, 0.8, 0.99):
        # noisy decays with long flat stretches: improvements, sub-min_delta
        # wiggles, and plateaus all occur
        base = 1.0 / (1.0 + 0.05 * np.arange(60))
        losses = base + rng.uniform(-1, 1, 60) * 5e-4
        _assert_lr_parity(list(losses), factor)


def test_plateau_matches_keras_min_delta_boundary():
    # improvement by EXACTLY min_delta (1e-4) is NOT an improvement in
    # Keras (strict np.less against best - min_delta); by 2e-4 it is
    seq = [1.0]
    for _ in range(PATIENCE + 2):
        seq.append(seq[-1] - 1e-4)  # never counts as improvement
    seq += [seq[-1] - 2e-4]  # counts; resets wait
    seq += [seq[-1]] * PATIENCE  # plateau back to a second reduction
    _assert_lr_parity(seq, 0.5)


def test_plateau_matches_keras_min_lr_clip():
    # monotone plateau long enough to walk 1e-4 down to the 1e-8 floor
    # (4+ reductions at factor 0.1) and keep going after the clip
    _assert_lr_parity([1.0] * (PATIENCE * 7), 0.1)


def test_plateau_matches_keras_recovery_after_reduction():
    # plateau -> reduction -> immediate improvement -> fresh plateau:
    # pins that neither side resets `best` on reduction and both restart
    # the patience counter
    seq = [0.5] * PATIENCE + [0.4] + [0.4] * PATIENCE + [0.39999] * 3
    _assert_lr_parity(seq, 0.5)


# --- ModelCheckpoint(save_best_only=True) decision parity ----------------


def _keras_save_epochs(val_losses, tmp_path):
    """Epochs (0-based) on which the real ModelCheckpoint writes."""
    model = tf.keras.Sequential([tf.keras.layers.Dense(1)])
    model.build((None, 1))
    model.compile(optimizer="adam", loss="mse")
    cb = tf.keras.callbacks.ModelCheckpoint(
        str(tmp_path / "best.weights.h5"),
        monitor="val_loss",
        save_best_only=True,
        save_weights_only=True,
    )
    cb.set_model(model)
    saves = []
    current_epoch = [0]
    real_save = model.save_weights
    model.save_weights = lambda *a, **k: saves.append(current_epoch[0])
    try:
        for epoch, v in enumerate(val_losses):
            current_epoch[0] = epoch
            cb.on_epoch_end(epoch, {"val_loss": float(v)})
    finally:
        model.save_weights = real_save
    return saves


def _our_save_epochs(val_losses, tmp_path):
    """Epochs on which train/checkpoint.save_checkpoint writes, using the
    real on-disk meta.json bookkeeping (orbax writes included)."""
    from typing import NamedTuple

    import jax.numpy as jnp

    from deeplabv3plus_keras_tpu.train.checkpoint import save_checkpoint

    class TinyState(NamedTuple):
        # minimal pytree with the `.step` the checkpointer reads
        step: jnp.ndarray
        w: jnp.ndarray

    saves = []
    for epoch, v in enumerate(val_losses):
        state = TinyState(jnp.asarray(epoch), jnp.zeros((2,)))
        if save_checkpoint(state, str(tmp_path), val_loss=float(v)):
            saves.append(epoch)
    return saves


def test_best_val_checkpoint_decisions_match_keras(tmp_path):
    rng = np.random.default_rng(13)
    # improvements, regressions, and EXACT ties (strict-less: a tie must
    # not save on either side)
    vals = list(np.round(rng.uniform(0.3, 0.6, 20), 2))
    vals[5] = vals[4]  # exact tie with the then-current value
    vals[11] = min(vals[:11])  # exact tie with the running best
    ours = _our_save_epochs(vals, tmp_path / "ours")
    keras = _keras_save_epochs(vals, tmp_path)
    assert ours == keras, f"vals={vals}"
    assert 0 in ours and 5 not in ours and 11 not in ours
