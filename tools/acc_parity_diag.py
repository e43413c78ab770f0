"""Diagnose the accuracy-parity synthetic task: does OUR side learn it?

Runs only this framework (no tf.keras) on the test_accuracy_parity task,
printing loss + train-batch mIoU every 20 steps, to find the step/lr
recipe that converges.  Throwaway diagnostic; not part of the suite.
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from test_full_model_parity import SIZE, _conf
from test_accuracy_parity import _make_batch, _miou, _np_cm, BATCH

LR = float(os.environ.get("LR", "1e-3"))
N_STEPS = int(os.environ.get("STEPS", "400"))

from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel.step import build_train_step, create_train_state

conf = _conf("mobilenetv2")
conf.nn_arch.dropout_rate = 0.0
conf.hps.lr = LR
conf.hps.decay = 0.0
model, variables = init_model(conf, jax.random.PRNGKey(0))

state, tx = create_train_state(conf, variables)
train_step = jax.jit(build_train_step(model, tx, conf))
step_rng = jax.random.PRNGKey(3)
apply = jax.jit(lambda v, x: model.apply(v, x, train=False))
# batch-stat eval: train-mode forward, mutated BN stats discarded
apply_bs = jax.jit(
    lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )[0]
)

eye = np.eye(21, dtype=np.float32)
data_rng = np.random.default_rng(11)

for i in range(N_STEPS):
    x, lab = _make_batch(data_rng)
    y = eye[lab]
    batch = {
        "image": jnp.asarray(x),
        "label": jnp.asarray(y),
        "valid": jnp.ones((BATCH,), jnp.int32),
    }
    state, metrics = train_step(state, batch, step_rng)
    if i % 20 == 0 or i == N_STEPS - 1:
        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        p = np.asarray(apply(eval_vars, jnp.asarray(x)))
        p_bs = np.asarray(apply_bs(eval_vars, jnp.asarray(x)))
        cm = _np_cm(lab, p.argmax(-1))
        cm_bs = _np_cm(lab, p_bs.argmax(-1))
        loss = float(metrics["loss"]) if isinstance(metrics, dict) else float(jax.tree.leaves(metrics)[0])
        print(
            f"step {i:4d}  loss {loss:.4f}  mIoU(moving-avg) {_miou(cm):.4f}"
            f"  mIoU(batch-stat) {_miou(cm_bs):.4f}",
            flush=True,
        )
