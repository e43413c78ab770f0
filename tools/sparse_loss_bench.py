"""Sparse (int-label) vs dense (one-hot) train-step time on the real TPU.

Round-1 negative result: the take_along_axis backward was a serialized
scatter (+66 ms per 8x512^2 batch), so dense stayed the fast path.  The
scatter-free one-hot-contraction backward should erase that gap while
reading ~21x less label HBM.  Methodology identical to bench.py (scan,
full-tree block, min-of-N).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import sys

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_conf
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

SIZE, B, STEPS, REPEATS = 512, 8, 10, 3


def measure(sparse: bool):
    conf = _flagship_conf(image_size=SIZE, batch_size=B)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = build_train_step(model, tx, conf)

    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    t = jnp.asarray(np_rng.integers(0, 21, (B, SIZE, SIZE)), jnp.int32)
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, SIZE, SIZE, 3)), jnp.float32),
        "label": t if sparse else jax.nn.one_hot(t, 21),
        "valid": jnp.ones((B,), jnp.int32),
    }

    @jax.jit
    def multi(state, batch, rng):
        def body(s, _):
            s, m = train_step(s, batch, rng)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=STEPS)

    out = multi(state, batch, rng)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = multi(state, batch, rng)
        jax.block_until_ready(out)
        float(jax.tree.leaves(out)[-1].reshape(-1)[-1])
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


if __name__ == "__main__":
    dense_ms = measure(sparse=False)
    sparse_ms = measure(sparse=True)
    print(f"dense  one-hot label train step: {dense_ms:.2f} ms ({B / dense_ms * 1e3:.1f} img/s)")
    print(f"sparse int label   train step: {sparse_ms:.2f} ms ({B / sparse_ms * 1e3:.1f} img/s)")
    print(f"sparse/dense ratio: {sparse_ms / dense_ms:.3f}")
