"""Xception-backbone flagship bench (the reference's other headline
backbone, pics/xception): same honest harness as bench.py.

python tools/xception_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np


def main():
    B, S, steps = 8, 512, 10
    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

    conf = _flagship_conf(image_size=S, batch_size=B)
    conf.base_model = "xception"
    # the reference's xception ASPP variant (conf.json encoder_middle_conf_xception)
    from deeplabv3plus_keras_tpu.config import MiddleOp

    conf.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=3, rate=(6, 6), input=0),
        MiddleOp(op="conv", kernel=3, rate=(12, 12), input=0),
        MiddleOp(op="conv", kernel=3, rate=(18, 18), input=0),
        MiddleOp(op="pyramid_pooling", kernel=1, input=0, target_size_factor=(1, 1)),
    ]
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = build_train_step(model, tx, conf)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(np_rng.integers(0, 21, (B, S, S))), 21),
        "valid": jnp.ones((B,), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def multi(state, batch, rng):
        def body(s, _):
            s, m = train_step(s, batch, rng)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=steps)

    out = multi(state, batch, rng)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(state, batch, rng)
        jax.block_until_ready(out)
        float(out[1][-1])
        best = min(best, (time.perf_counter() - t0) / steps)
    print(
        f"xception 512x512 batch {B}: train_step {best*1e3:.1f} ms "
        f"({B/best:.1f} img/s, {B/best/1.5:.1f}x baseline)",
        flush=True,
    )


if __name__ == "__main__":
    main()
