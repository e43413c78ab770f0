"""'remat' config option: backbone rematerialization must be numerically
identical to the plain backward pass (it only changes the memory/FLOPs
trade, not semantics)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.config import Config, MiddleOp
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import (

    build_train_step,
    create_train_state,
    make_mesh,
    shard_step,
)


def test_remat_is_numerically_identical():
    c = Config()
    c.base_model = "mobilenetv2"
    c.nn_arch.image_size = 32
    c.nn_arch.boundary_refinement = False
    c.nn_arch.reduction_size = 8
    c.nn_arch.concat_channels = 8
    c.nn_arch.encoder_middle_conf = [MiddleOp(op="conv", kernel=1, input=-1)]
    c.hps.batch_size = 2

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(rng.integers(0, 21, (2, 32, 32))), 21),
        "valid": jnp.ones((2,), jnp.int32),
    }

    out = {}
    for remat in (False, True):
        c.extra["remat"] = remat
        model, v = init_model(c, jax.random.PRNGKey(0))
        state, tx = create_train_state(c, v)
        step = shard_step(
            build_train_step(model, tx, c), make_mesh(n_data=1), kind="train"
        )
        state, m = step(state, batch, jax.random.PRNGKey(1))
        out[remat] = (float(m["loss"]), jax.tree.leaves(state.params))

    np.testing.assert_allclose(out[False][0], out[True][0], rtol=1e-6)
    for a, b in zip(out[False][1], out[True][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
