"""Gradient-sanity: overfitting a fixed tiny batch must drive the
class-balanced loss down substantially (guards against silent gradient
breakage anywhere in backbone/encoder/decoder/loss/optimizer)."""

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


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_overfit_tiny_batch(dtype):
    """fp32 is the parity default; bf16 is the deployment configuration
    (fp32 params, bf16 compute — flax dtype/param_dtype split) and must
    converge the same way."""
    c = Config()
    c.base_model = "mobilenetv2"
    c.hps.dtype = dtype
    c.nn_arch.image_size = 32
    c.nn_arch.boundary_refinement = True
    c.nn_arch.reduction_size = 16
    c.nn_arch.concat_channels = 16
    c.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=1, input=0),
    ]
    c.nn_arch.dropout_rate = 0.0
    c.hps.lr = 3e-3
    c.hps.batch_size = 2

    model, variables = init_model(c, jax.random.PRNGKey(0))
    state, tx = create_train_state(c, variables)
    step = shard_step(build_train_step(model, tx, c), make_mesh(n_data=1), kind="train")

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32),
        # constant labels: trivially learnable, so the loss must crater
        "label": jax.nn.one_hot(jnp.full((2, 32, 32), 3), 21),
        "valid": jnp.ones((2,), jnp.int32),
    }
    key = jax.random.PRNGKey(3)
    first = None
    for i in range(40):
        state, m = step(state, batch, key)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < 0.3 * first, (first, last)
