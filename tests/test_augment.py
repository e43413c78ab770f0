"""Train-time augmentation (ops/augment) + TTA evaluation numerics.

The deterministic core (apply_augment with handpicked params) is pinned
against NumPy; the sampled path and the train-step / eval-step wiring are
exercised end-to-end.  Augmentation is a beyond-parity addition (the
reference trains without any, SURVEY §2.1) and defaults OFF — the
trajectory-parity suite keeps that pinned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3plus_keras_tpu.ops.augment import (
    apply_augment,
    augment_batch,
    parse_augment_conf,
)


def params_for(B, flip=False, z=1.0, uy=0.0, ux=0.0):
    mk = lambda v, dt: jnp.full((B,), v, dt)
    return {
        "flip": mk(flip, bool),
        "z": mk(z, jnp.float32),
        "uy": mk(uy, jnp.float32),
        "ux": mk(ux, jnp.float32),
    }


def one_hot_labels(rng, B, S, C):
    return np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, S, S))]


def test_parse_augment_conf():
    assert parse_augment_conf(None) is None
    assert parse_augment_conf(False) is None
    assert parse_augment_conf(True) == (True, (0.5, 2.0))
    assert parse_augment_conf({"random_flip": False}) == (False, (0.5, 2.0))
    assert parse_augment_conf(
        {"random_flip": True, "scale_range": [0.75, 1.25]}
    ) == (True, (0.75, 1.25))
    assert parse_augment_conf({"random_flip": False, "scale_range": None}) is None
    with pytest.raises(ValueError, match="scale_range"):
        parse_augment_conf({"scale_range": [2.0, 0.5]})


def test_identity_params_are_exact(rng):
    B, S, C = 2, 8, 4
    img = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    lab = jnp.asarray(one_hot_labels(rng, B, S, C))
    out_img, out_lab = apply_augment(img, lab, params_for(B))
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))


def test_flip_matches_numpy(rng):
    B, S, C = 2, 8, 4
    img = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    lab = jnp.asarray(one_hot_labels(rng, B, S, C))
    out_img, out_lab = apply_augment(img, lab, params_for(B, flip=True))
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab)[:, :, ::-1])


def test_zoom_out_is_subsampling(rng):
    """z=0.5 with u=0: out(y, x) = in(2y, 2x) where in range, 0 outside —
    integer source coordinates make the bilinear gather exact."""
    B, S, C = 1, 8, 3
    img = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    lab = jnp.asarray(one_hot_labels(rng, B, S, C))
    out_img, out_lab = apply_augment(img, lab, params_for(B, z=0.5))
    want_img = np.zeros_like(np.asarray(img))
    want_lab = np.zeros_like(np.asarray(lab))
    want_lab[..., 0] = 1.0  # out-of-range label fill = background one-hot
    half = (S - 1) // 2 + 1  # src 2y <= S-1
    want_img[:, :half, :half] = np.asarray(img)[:, ::2, ::2][:, :half, :half]
    want_lab[:, :half, :half] = np.asarray(lab)[:, ::2, ::2][:, :half, :half]
    np.testing.assert_allclose(np.asarray(out_img), want_img, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_lab), want_lab)


def test_zoom_in_bilinear_on_linear_ramp():
    """z=2 with u=0 crops the top-left half at 2×: a linear ramp image
    img[y, x] = y resamples exactly to y/2 under bilinear interpolation."""
    B, S = 1, 8
    ramp = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.float32)[:, None, None], (S, S, 1)
    )[None]
    out, _ = apply_augment(ramp, None, params_for(B, z=2.0))
    want = np.arange(S, dtype=np.float32)[None, :, None, None] / 2.0
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(want, out.shape),
                               atol=1e-6)


def test_one_hot_and_sparse_labels_agree(rng):
    """Augmenting sparse integer labels must equal augmenting their one-hot
    encoding (nearest-neighbor label gather is a pixel permutation)."""
    B, S, C = 2, 10, 5
    idx = rng.integers(0, C, (B, S, S))
    one_hot = jnp.asarray(np.eye(C, dtype=np.float32)[idx])
    sparse = jnp.asarray(idx, jnp.int32)
    img = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    p = params_for(B, flip=True, z=0.8, uy=0.3, ux=0.7)
    _, out_oh = apply_augment(img, one_hot, p)
    _, out_sp = apply_augment(img, sparse, p)
    # one-hot stays exactly one-hot
    np.testing.assert_array_equal(np.asarray(out_oh).sum(-1), 1.0)
    np.testing.assert_array_equal(
        np.asarray(out_oh).argmax(-1), np.asarray(out_sp)
    )


def test_augment_batch_sampled_path(rng):
    """The rng-driven entry point: shapes/dtypes preserved, per-sample
    variation present, and the no-op configuration is an exact identity."""
    B, S, C = 4, 12, 3
    img = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    lab = jnp.asarray(one_hot_labels(rng, B, S, C))
    key = jax.random.PRNGKey(3)

    out_img, out_lab = jax.jit(
        lambda i, l, k: augment_batch(i, l, k, flip=True, scale_range=(0.5, 2.0))
    )(img, lab, key)
    assert out_img.shape == img.shape and out_img.dtype == img.dtype
    assert out_lab.shape == lab.shape and out_lab.dtype == lab.dtype
    # per-sample parameters: at least two samples must differ from input
    changed = [
        not np.array_equal(np.asarray(out_img[i]), np.asarray(img[i]))
        for i in range(B)
    ]
    assert sum(changed) >= 2

    same_img, same_lab = augment_batch(img, lab, key, flip=False, scale_range=None)
    np.testing.assert_array_equal(np.asarray(same_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(same_lab), np.asarray(lab))


@pytest.mark.slow
def test_train_step_with_augmentation(rng):
    """extra key 'augment': the train step runs with augmentation fused in,
    produces finite loss and a CM whose pixel count is unchanged."""
    from tests.test_grad_accum import make_batch, tiny_conf

    from deeplabv3plus_keras_tpu.models import create_model
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_train_step,
        create_train_state,
    )

    C, S, B = 5, 32, 4
    conf = tiny_conf({"augment": {"random_flip": True, "scale_range": [0.5, 2.0]}})
    model = create_model(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, S, S, 3), jnp.float32),
        train=False,
    )
    state, tx = create_train_state(conf, variables)
    step = jax.jit(build_train_step(model, tx, conf))
    batch = make_batch(rng, B, S, C)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert np.asarray(metrics["cm"]).sum() == B * S * S
    assert int(new_state.step) == 1
    # different steps draw different augmentations → different losses
    _, metrics2 = step(new_state, batch, jax.random.PRNGKey(7))
    assert float(metrics2["loss"]) != float(metrics["loss"])


@pytest.mark.slow
def test_augmented_step_is_mesh_invariant(rng):
    """Augmentation params are drawn from the replicated step rng, so the
    same batch must produce the same loss/CM on a 1- and 4-device mesh."""
    from tests.test_grad_accum import make_batch, tiny_conf

    from deeplabv3plus_keras_tpu.models import create_model
    from deeplabv3plus_keras_tpu.parallel import make_mesh, shard_step
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_train_step,
        create_train_state,
    )

    C, S, B = 5, 32, 8
    conf = tiny_conf({"augment": True})
    conf.hps.batch_size = B
    conf.nn_arch.dropout_rate = 0.0  # dropout masks are layout-dependent
    model = create_model(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, S, S, 3), jnp.float32),
        train=False,
    )
    batch = make_batch(rng, B, S, C)
    key = jax.random.PRNGKey(7)
    results = {}
    for n_data in (1, 4):
        vs = jax.tree.map(jnp.array, variables)
        state, tx = create_train_state(conf, vs)
        step = shard_step(
            build_train_step(model, tx, conf), make_mesh(n_data=n_data),
            kind="train",
        )
        _, m = step(state, dict(batch), key)
        results[n_data] = (float(m["loss"]), np.asarray(m["cm"]))
    assert np.isclose(results[1][0], results[4][0], rtol=1e-5)
    assert np.abs(results[1][1] - results[4][1]).sum() <= 8


@pytest.mark.slow
def test_tta_eval_single_scale_equals_plain(rng):
    """TTA with scales=[1.0], no flip is numerically the plain eval step."""
    from tests.test_grad_accum import make_batch, tiny_conf

    from deeplabv3plus_keras_tpu.models import create_model
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_eval_step,
        create_train_state,
    )

    C, S, B = 5, 32, 2
    conf = tiny_conf()
    model = create_model(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, S, S, 3), jnp.float32),
        train=False,
    )
    state, _ = create_train_state(conf, variables)
    batch = make_batch(rng, B, S, C)
    plain = jax.jit(build_eval_step(model, conf))(state, batch)
    tta = jax.jit(build_eval_step(model, conf, tta_scales=[1.0]))(state, batch)
    np.testing.assert_allclose(
        np.asarray(tta["probs"]), np.asarray(plain["probs"]), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(tta["cm"]), np.asarray(plain["cm"]))
    np.testing.assert_allclose(float(tta["loss"]), float(plain["loss"]), rtol=1e-6)


@pytest.mark.slow
def test_tta_flip_is_average_of_both_orientations(rng):
    from tests.test_grad_accum import make_batch, tiny_conf

    from deeplabv3plus_keras_tpu.models import create_model
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_eval_step,
        build_predict_step,
        create_train_state,
    )

    C, S, B = 5, 32, 2
    conf = tiny_conf()
    model = create_model(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, S, S, 3), jnp.float32),
        train=False,
    )
    state, _ = create_train_state(conf, variables)
    batch = make_batch(rng, B, S, C)
    predict = jax.jit(build_predict_step(model))
    p = np.asarray(predict(state, batch["image"]))
    pf = np.asarray(predict(state, batch["image"][:, :, ::-1]))[:, :, ::-1]
    tta = jax.jit(build_eval_step(model, conf, tta_flip=True))(state, batch)
    np.testing.assert_allclose(np.asarray(tta["probs"]), (p + pf) / 2, atol=1e-6)


@pytest.mark.slow
def test_tta_multi_scale_runs_and_normalizes(rng):
    """Scales below/above 1 (rounded to output-stride multiples) execute in
    one jit; averaged softmax probabilities still sum to 1."""
    from tests.test_grad_accum import make_batch, tiny_conf

    from deeplabv3plus_keras_tpu.models import create_model
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_eval_step,
        create_train_state,
    )

    C, S, B = 5, 32, 2
    conf = tiny_conf()
    model = create_model(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, S, S, 3), jnp.float32),
        train=False,
    )
    state, _ = create_train_state(conf, variables)
    batch = make_batch(rng, B, S, C)
    step = jax.jit(
        build_eval_step(model, conf, tta_scales=[0.5, 1.0, 1.5], tta_flip=True)
    )
    out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, atol=1e-5)
    assert np.asarray(out["cm"]).sum() == B * S * S
