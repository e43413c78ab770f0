"""SPMD correctness on the 8-virtual-device CPU mesh: the sharded train
step must be numerically equivalent to the single-device step (the GSPMD
gradient psum is an implementation detail, not a semantics change)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.config import Config, MiddleOp
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import (

    build_eval_step,
    build_train_step,
    create_train_state,
    make_mesh,
    shard_step,
)


def tiny_conf(batch):
    c = Config()
    c.base_model = "mobilenetv2"
    c.nn_arch.image_size = 32
    c.nn_arch.boundary_refinement = False
    c.nn_arch.reduction_size = 16
    c.nn_arch.concat_channels = 16
    c.nn_arch.encoder_middle_conf = [MiddleOp(op="conv", kernel=1, input=-1)]
    c.nn_arch.dropout_rate = 0.0  # dropout mask sharding differs by layout
    c.hps.batch_size = batch
    return c


@pytest.fixture(scope="module")
def setup():
    conf = tiny_conf(8)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(rng.integers(0, 21, (8, 32, 32))), 21),
        "valid": jnp.ones((8,), jnp.int32),
    }
    return conf, model, variables, batch


@pytest.mark.parametrize("n_data,n_space", [(1, 1), (4, 1), (4, 2), (2, 4)])
def test_train_step_invariant_to_mesh(setup, n_data, n_space):
    conf, model, variables, batch = setup
    # donate_argnums on the train step consumes the state buffers — give
    # each parametrization its own copy of the shared fixture arrays.
    variables = jax.tree.map(jnp.array, variables)
    state, tx = create_train_state(conf, variables)
    mesh = make_mesh(n_data=n_data, n_space=n_space)
    step = shard_step(
        build_train_step(model, tx, conf), mesh, kind="train", spatial=n_space > 1
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    cm = np.asarray(metrics["cm"])
    if not hasattr(test_train_step_invariant_to_mesh, "_ref"):
        test_train_step_invariant_to_mesh._ref = (loss, cm, new_state.params)
    ref_loss, ref_cm, ref_params = test_train_step_invariant_to_mesh._ref
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
    # Sharding splits reductions (BN stats, loss sums) → different float
    # summation order: a rare argmax tie can flip one pixel's class, and
    # Adam's step-1 m/√v amplifies near-zero gradient differences.
    assert np.abs(cm - ref_cm).sum() <= 8, np.abs(cm - ref_cm).sum()
    atol = 0.0 if n_data * n_space == 1 else 3e-3
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_eval_step_spatial_sharding(setup):
    conf, model, variables, batch = setup
    state, _ = create_train_state(conf, variables)
    m1 = make_mesh(n_data=1, n_space=1)
    m2 = make_mesh(n_data=2, n_space=4)
    e1 = shard_step(build_eval_step(model, conf), m1, kind="eval")
    e2 = shard_step(build_eval_step(model, conf), m2, kind="eval", spatial=True)
    r1, r2 = e1(state, batch), e2(state, batch)
    np.testing.assert_allclose(float(r1["loss"]), float(r2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r1["probs"]), np.asarray(r2["probs"]), atol=1e-5
    )


@pytest.mark.parametrize("fused", [True, False])
def test_refinement_decoder_invariant_to_spatial_mesh(fused):
    """The refinement decoder — split classifier conv + the fused
    upsample-into-conv transposed conv with its border patches (round-3
    rewrite) — must stay mesh-invariant under ('data','space') sharding:
    GSPMD has to halo the lhs_dilated conv and partition the
    dynamic-update-slice border writes without changing numerics."""
    conf = tiny_conf(8)
    conf.nn_arch.boundary_refinement = True
    conf.extra["fused_upconv"] = fused
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(rng.integers(0, 21, (8, 32, 32))), 21),
        "valid": jnp.ones((8,), jnp.int32),
    }
    state, _ = create_train_state(conf, variables)
    e1 = shard_step(
        build_eval_step(model, conf), make_mesh(n_data=1, n_space=1), kind="eval"
    )
    e2 = shard_step(
        build_eval_step(model, conf),
        make_mesh(n_data=2, n_space=4),
        kind="eval",
        spatial=True,
    )
    r1, r2 = e1(state, batch), e2(state, batch)
    np.testing.assert_allclose(float(r1["loss"]), float(r2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r1["probs"]), np.asarray(r2["probs"]), atol=1e-5
    )
