"""Loss / metric / optimizer numerics + sharded-step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3plus_keras_tpu.train import (
    SS_NW,
    SS_PW,
    MeanIoU,
    class_balanced_loss,
    confusion_matrix_update,
    l2_penalty,
    make_optimizer,
)


def numpy_reference_loss(y_true, y_pred, pw, nw, eps=1e-7):
    """Straight NumPy transcription of the reference loss formula
    (semantic_segmentation.py:438-447)."""
    loss = np.zeros(y_true.shape[:-1])
    for i in range(len(pw)):
        loss += -1.0 * (
            pw[i] * y_true[..., i] * np.log(y_pred[..., i] + eps)
            + nw[i] * (1.0 - y_true[..., i]) * np.log(1.0 - y_pred[..., i] + eps)
        )
    return loss.mean()


def test_class_balanced_loss_matches_reference_formula(rng):
    B, H, W, C = 2, 6, 6, 21
    labels = rng.integers(0, C, (B, H, W))
    y_true = np.eye(C, dtype=np.float32)[labels]
    logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
    y_pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ours = float(class_balanced_loss(y_true, y_pred, SS_PW, SS_NW))
    ref = numpy_reference_loss(y_true.astype(np.float64), y_pred.astype(np.float64), SS_PW, SS_NW)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_loss_valid_mask_equals_subset_loss(rng):
    C = 21
    y_true = np.eye(C, dtype=np.float32)[rng.integers(0, C, (4, 5, 5))]
    y_pred = rng.uniform(0.01, 0.99, (4, 5, 5, C)).astype(np.float32)
    valid = np.array([1, 1, 0, 0], np.int32)
    masked = float(class_balanced_loss(y_true, y_pred, valid=valid))
    subset = float(class_balanced_loss(y_true[:2], y_pred[:2]))
    np.testing.assert_allclose(masked, subset, rtol=1e-6)


def test_ss_weights_sum():
    np.testing.assert_allclose(SS_PW + SS_NW, 1.0, atol=1e-6)


def test_confusion_matrix_and_miou(rng):
    C = 3
    t = np.array([0, 0, 1, 1, 2, 2])
    p = np.array([0, 1, 1, 1, 2, 0])
    y_true = np.eye(C, dtype=np.float32)[t].reshape(1, 6, C)
    y_pred = np.eye(C, dtype=np.float32)[p].reshape(1, 6, C)
    cm = np.asarray(confusion_matrix_update(y_true, y_pred, C))
    expected_cm = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 1]])
    np.testing.assert_array_equal(cm, expected_cm)
    m = MeanIoU(C).update_state(y_true, y_pred)
    # per-class IoU: 0: 1/(2+2-1)=1/3, 1: 2/(2+3-2)=2/3, 2: 1/(2+1-1)=1/2
    np.testing.assert_allclose(m.result(), (1 / 3 + 2 / 3 + 1 / 2) / 3, rtol=1e-6)


def test_per_class_iou_and_report(rng):
    C = 4  # class 3 never appears in truth or prediction → NaN / "n/a"
    t = np.array([0, 0, 1, 1, 2, 2])
    p = np.array([0, 1, 1, 1, 2, 0])
    y_true = np.eye(C, dtype=np.float32)[t].reshape(1, 6, C)
    y_pred = np.eye(C, dtype=np.float32)[p].reshape(1, 6, C)
    m = MeanIoU(C).update_state(y_true, y_pred)
    iou = m.per_class_iou()
    np.testing.assert_allclose(iou[:3], [1 / 3, 2 / 3, 1 / 2], rtol=1e-12)
    assert np.isnan(iou[3])
    # mean over valid classes must equal result()
    np.testing.assert_allclose(np.nanmean(iou), m.result(), rtol=1e-12)
    report = m.report(["bg", "cat", "dog", "ghost"])
    assert "cat" in report and "0.6667" in report
    assert "ghost" in report and "n/a" in report
    assert report.strip().endswith(f"{m.result():.4f}")


def test_voc_class_names_table():
    from deeplabv3plus_keras_tpu.data import voc

    assert len(voc.CLASS_NAMES) == 21
    assert voc.CLASS_NAMES[0] == "background"
    assert voc.CLASS_NAMES[15] == "person"


def test_miou_accum_vs_replace(rng):
    C = 4
    a = np.eye(C, dtype=np.float32)[rng.integers(0, C, (1, 10))]
    b = np.eye(C, dtype=np.float32)[rng.integers(0, C, (1, 10))]
    acc = MeanIoU(C, accum_enable=True).update_state(a, a).update_state(a, b)
    rep = MeanIoU(C, accum_enable=False).update_state(a, a).update_state(a, b)
    only_b = MeanIoU(C).update_state(a, b)
    assert rep.result() == only_b.result()
    assert acc.total_cm.sum() == 20 and rep.total_cm.sum() == 10


def test_l2_penalty_selects_tagged_params():
    params = {
        "encoder": {"conv_l2": {"kernel": jnp.ones((2, 2))}},
        "base": {"conv": {"kernel": jnp.ones((3, 3))}},
    }
    assert float(l2_penalty(params, 0.1)) == np.float32(0.1 * 4)
    assert float(l2_penalty(params, 0.0)) == 0.0


def test_adam_keras_epsilon_placement():
    """5 Adam steps must track the exact Keras formula — ε applied to the
    UNCORRECTED √v, bias correction folded into the step size
    (θ −= lr·√(1−β₂ᵗ)/(1−β₁ᵗ)·m/(√v+ε), ε=1e-7) — at gradient magnitudes
    covering the √v≈ε regime where optax.scale_by_adam diverges by ~2×
    (VERDICT r2: 4.1e-3 absolute at g=1e-6).  fp64 NumPy oracle, tight
    fp32 tolerance; the TF cross-check lives in test_optimizer_parity.py."""
    import optax

    from deeplabv3plus_keras_tpu.config import HParams

    lr, b1, b2, eps = 0.01, 0.5, 0.99, 1e-7
    for g_mag in (0.5, 1e-6, 1e-8):
        hps = HParams(lr=lr, beta_1=b1, beta_2=b2, decay=0.0)
        tx = make_optimizer(hps)
        p = {"w": jnp.array([1.0, 2.0])}
        g = {"w": jnp.array([g_mag, -g_mag], jnp.float32)}
        st = tx.init(p)
        # fp64 oracle of the Keras update rule
        theta = np.array([1.0, 2.0])
        grad = np.array([g_mag, -g_mag], np.float64)
        m = np.zeros(2)
        v = np.zeros(2)
        for t in range(1, 6):
            updates, st = tx.update(g, st, p)
            p = optax.apply_updates(p, updates)
            m = b1 * m + (1 - b1) * grad
            v = b2 * v + (1 - b2) * grad**2
            alpha = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
            theta = theta - alpha * m / (np.sqrt(v) + eps)
            np.testing.assert_allclose(
                np.asarray(p["w"], np.float64),
                theta,
                atol=1e-7,
                err_msg=f"g={g_mag} step={t}",
            )


def test_lr_decay_schedule():
    from deeplabv3plus_keras_tpu.config import HParams
    import optax

    hps = HParams(lr=0.1, decay=0.5)
    tx = make_optimizer(hps)
    p = {"w": jnp.array([0.0])}
    g = {"w": jnp.array([1.0])}
    st = tx.init(p)
    # step at t: scale 1/(1+0.5t)
    u0, st = tx.update(g, st, p)
    u1, st = tx.update(g, st, p)
    r = float(u1["w"][0] / u0["w"][0])
    np.testing.assert_allclose(r, 1 / 1.5, rtol=1e-2)


def test_set_learning_rate_roundtrip():
    from deeplabv3plus_keras_tpu.config import HParams
    from deeplabv3plus_keras_tpu.train import get_learning_rate, set_learning_rate

    tx = make_optimizer(HParams(lr=0.01))
    st = tx.init({"w": jnp.zeros(1)})
    assert abs(get_learning_rate(st) - 0.01) < 1e-9
    st = set_learning_rate(st, 0.005)
    assert abs(get_learning_rate(st) - 0.005) < 1e-9


def test_lr_schedule_poly_and_exponential():
    from deeplabv3plus_keras_tpu.train.callbacks import LRSchedule

    # exponential: the reference's commented-out scheduler (:992-998)
    exp = LRSchedule({"type": "exponential", "factor": 0.5}, 0.01, 4)
    np.testing.assert_allclose(
        [exp.lr(e) for e in range(4)], [0.01, 0.005, 0.0025, 0.00125]
    )
    # factor defaults to reduce_lr_factor
    assert LRSchedule({"type": "exponential"}, 1.0, 3, default_factor=0.9).lr(1) == 0.9

    # poly: DeepLab recipe, (1 - e/E)^p toward end_lr
    poly = LRSchedule({"type": "poly", "power": 0.9, "end_lr": 1e-6}, 0.01, 10)
    assert poly.lr(0) == 0.01
    expected = (0.01 - 1e-6) * (1 - 5 / 10) ** 0.9 + 1e-6
    np.testing.assert_allclose(poly.lr(5), expected, rtol=1e-12)
    # monotone nonincreasing, never below end_lr, clamped at the last epoch
    lrs = [poly.lr(e) for e in range(10)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:])) and lrs[-1] >= 1e-6
    assert poly.lr(99) == poly.lr(9)  # past-the-end clamp

    # defaults: type poly, power 0.9, end_lr 0
    dflt = LRSchedule({}, 0.01, 10)
    np.testing.assert_allclose(dflt.lr(5), 0.01 * 0.5**0.9, rtol=1e-12)

    with pytest.raises(ValueError, match="lr_schedule"):
        LRSchedule({"type": "cosine"}, 0.01, 10)


def test_reduce_lr_on_plateau():
    from deeplabv3plus_keras_tpu.train.callbacks import ReduceLROnPlateau

    cb = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=1e-4)
    lr = 0.1
    lr = cb.update(1.0, lr)   # improves (best=1.0)
    lr = cb.update(1.0, lr)   # no improvement, wait=1
    assert lr == 0.1
    lr = cb.update(1.0, lr)   # wait=2 → reduce
    assert lr == 0.05


def test_confusion_matrix_chunked_matches_unchunked(rng, monkeypatch):
    """Batches above CM_CHUNK_PIXELS accumulate int32 partial matmuls;
    forcing a tiny chunk must reproduce the single-matmul CM exactly
    (regression for the fp32 2^24 integer-exactness bound)."""
    from deeplabv3plus_keras_tpu.train import metrics

    C = 5
    t = rng.integers(0, C, (3, 41, 37))
    p = rng.integers(0, C, (3, 41, 37))
    valid = np.array([1, 0, 1], np.int32)
    import jax.numpy as jnp

    whole = np.asarray(metrics._cm_matmul(jnp.asarray(t), jnp.asarray(p), C, jnp.asarray(valid)))
    monkeypatch.setattr(metrics, "CM_CHUNK_PIXELS", 1000)  # 4551 px → 5 chunks
    chunked = np.asarray(metrics._cm_matmul(jnp.asarray(t), jnp.asarray(p), C, jnp.asarray(valid)))
    np.testing.assert_array_equal(whole, chunked)
    # ground truth via numpy
    expected = np.zeros((C, C), np.int64)
    for b in range(3):
        if not valid[b]:
            continue
        np.add.at(expected, (t[b].ravel(), p[b].ravel()), 1)
    np.testing.assert_array_equal(chunked, expected)


def test_sparse_loss_gradient_matches_dense(rng):
    """The sparse loss's scatter-free backward must equal the dense one-hot
    path's gradient wrt the probabilities (same math, fused one-hot)."""
    import jax
    import jax.numpy as jnp

    from deeplabv3plus_keras_tpu.train.loss import (
        class_balanced_loss,
        class_balanced_loss_sparse,
    )

    t = rng.integers(0, 21, (2, 9, 9))
    p = rng.uniform(0.01, 0.99, (2, 9, 9, 21)).astype(np.float32)
    onehot = np.eye(21, dtype=np.float32)[t]
    valid = jnp.asarray([1, 0], jnp.int32)

    gd = jax.grad(lambda q: class_balanced_loss(onehot, q, valid=valid))(jnp.asarray(p))
    gs = jax.grad(
        lambda q: class_balanced_loss_sparse(jnp.asarray(t), q, valid=valid)
    )(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=1e-7)
    # and the scatter-free backward contains no scatter op
    jaxpr = str(
        jax.make_jaxpr(
            jax.grad(lambda q: class_balanced_loss_sparse(jnp.asarray(t), q))
        )(jnp.asarray(p))
    )
    assert "scatter" not in jaxpr
