"""Measurement-integrity check: does block_until_ready actually await
device completion through the axon tunnel, or only buffer commitment?
Compares block_until_ready-based timing vs forcing a scalar fetch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    S, B, steps = 512, 8, 30
    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

    conf = _flagship_conf(image_size=S, batch_size=B)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = build_train_step(model, tx, conf)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "label": jnp.asarray(np_rng.integers(0, 21, (B, S, S)), jnp.int32),
        "valid": jnp.ones((B,), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def multi(state, batch, rng):
        def body(s, _):
            s, m = train_step(s, batch, rng)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=steps)

    st, losses = multi(state, batch, rng)
    jax.block_until_ready(losses)
    print("warm done", float(losses[-1]), flush=True)

    t0 = time.perf_counter()
    st2, losses = multi(state, batch, rng)
    jax.block_until_ready((st2, losses))
    t_block = time.perf_counter() - t0

    t0 = time.perf_counter()
    st3, losses = multi(state, batch, rng)
    v = float(losses[-1])  # forces real value fetch
    t_fetch = time.perf_counter() - t0

    print(
        f"block_until_ready: {t_block/steps*1e3:.3f} ms/step; "
        f"scalar fetch: {t_fetch/steps*1e3:.3f} ms/step (loss={v:.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
