"""Gradient accumulation (grad_accum key): the scanned N-microbatch step
must equal an explicit hand-rolled loop — per-microbatch grads with BN
stats threaded, averaged, one optimizer update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

from deeplabv3plus_keras_tpu.config import Config
from deeplabv3plus_keras_tpu.models import create_model
from deeplabv3plus_keras_tpu.parallel.step import (
    build_train_step,
    create_train_state,
    default_class_weights,
)
from deeplabv3plus_keras_tpu.train.loss import class_balanced_loss, l2_penalty
from deeplabv3plus_keras_tpu.train.metrics import confusion_matrix_update


def tiny_conf(extra=None):
    d = {
        "mode": "train",
        "base_model": "mobilenetv2",
        "hps": {"lr": 0.01, "beta_1": 0.5, "beta_2": 0.99, "decay": 0.0,
                "weight_decay": 0.0001, "bn_momentum": 0.9, "bn_scale": True,
                "batch_size": 4, "epochs": 1, "val_ratio": 0.5,
                "reduce_lr_factor": 0.5, "dtype": "float32"},
        "nn_arch": {"boundary_refinement": False, "output_stride": 16,
                    "image_size": 32, "num_classes": 5,
                    "conv_rate_multiplier": 1, "reduction_size": 8,
                    "dropout_rate": 0.5, "concat_channels": 8,
                    "encoder_middle_conf": [
                        {"kernel": 1, "rate": [1, 1], "op": "conv",
                         "input": -1}]},
    }
    d.update(extra or {})
    return Config.from_dict(d)


def make_batch(rng, B, S, C):
    img = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    idx = rng.integers(0, C, (B, S, S))
    lab = jnp.asarray(np.eye(C, dtype=np.float32)[idx])
    return {"image": img, "label": lab, "valid": jnp.ones((B,), jnp.int32)}


def test_grad_accum_matches_manual_loop(rng):
    import optax

    C, S, B, ACC = 5, 32, 4, 2
    conf = tiny_conf({"grad_accum": ACC})
    model = create_model(conf)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key}, jnp.zeros((1, S, S, 3), jnp.float32), train=False
    )
    # SGD isolates the accumulation math: with Adam, a near-zero accumulated
    # gradient makes the update ±lr on fp sign noise, so post-update params
    # can't be compared tightly.
    state, tx = create_train_state(conf, variables, tx=optax.sgd(0.1))
    batch = make_batch(rng, B, S, C)
    step_key = jax.random.PRNGKey(7)

    step = jax.jit(build_train_step(model, tx, conf))
    new_state, metrics = step(state, batch, step_key)

    # ---- independent manual accumulation ----
    pw, nw = default_class_weights(C)
    step_rng = jax.random.fold_in(step_key, state.step)
    bs = state.batch_stats
    gsum = jax.tree.map(jnp.zeros_like, state.params)
    lsum, cmsum = 0.0, np.zeros((C, C), np.int64)
    for i in range(ACC):
        mb = jax.tree.map(lambda x: x[i * (B // ACC):(i + 1) * (B // ACC)], batch)

        def loss_fn(p, bs=bs, mb=mb, i=i):
            probs, mut = model.apply(
                {"params": p, "batch_stats": bs}, mb["image"], train=True,
                rngs={"dropout": jax.random.fold_in(step_rng, i)},
                mutable=["batch_stats"],
            )
            loss = class_balanced_loss(mb["label"], probs, pw, nw, valid=mb["valid"])
            return loss + l2_penalty(p, conf.hps.weight_decay), (probs, mut)

        # jit the manual grads too: eager-vs-jit fp32 reassociation through
        # the BN chains alone reaches ~1e-3 and would swamp the comparison.
        (loss, (probs, mut)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(state.params)
        bs = mut["batch_stats"]
        gsum = jax.tree.map(jnp.add, gsum, grads)
        lsum += float(loss)
        cmsum += np.asarray(confusion_matrix_update(mb["label"], probs, C, mb["valid"]))
    grads = jax.tree.map(lambda g: g / ACC, gsum)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    assert np.isclose(float(metrics["loss"]), lsum / ACC, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(metrics["cm"]), cmsum)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
        new_state.params,
        want_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
        new_state.batch_stats,
        bs,
    )
    assert int(new_state.step) == 1


def test_grad_accum_on_sharded_mesh(rng):
    """grad_accum composes with the data-parallel mesh: the scanned
    microbatches reshape a sharded batch (GSPMD re-lays out each
    (accum, B/accum) microbatch across 'data'); one step must run and
    match the single-device accum step."""
    import numpy as np

    from deeplabv3plus_keras_tpu.parallel import make_mesh, shard_step

    C, S, B, ACC = 5, 32, 8, 2
    conf = tiny_conf({"grad_accum": ACC})
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
        vs = jax.tree.map(jnp.array, variables)  # donation-safe copies
        state, tx = create_train_state(conf, vs)
        step = shard_step(
            build_train_step(model, tx, conf), make_mesh(n_data=n_data),
            kind="train",
        )
        new_state, m = step(state, dict(batch), key)
        # second step exercises the updated params/opt state on the mesh
        _, m2 = step(new_state, dict(batch), key)
        results[n_data] = (float(m["loss"]), np.asarray(m["cm"]), float(m2["loss"]))
    # loss/CM invariance across meshes (post-update params are NOT compared:
    # sharded reductions reorder float sums and the single-device accum
    # equivalence test already pins the update math — same policy as
    # test_sharding, which bounds the Adam-update diff instead)
    assert np.isclose(results[1][0], results[4][0], rtol=1e-5)
    assert np.abs(results[1][1] - results[4][1]).sum() <= 8
    assert np.isfinite(results[4][2])


def test_grad_accum_must_divide_batch(rng):
    conf = tiny_conf({"grad_accum": 3})
    model = create_model(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        train=False,
    )
    state, tx = create_train_state(conf, variables)
    step = build_train_step(model, tx, conf)
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, make_batch(rng, 4, 32, 5), jax.random.PRNGKey(7))
