"""Measure the on-chip cost of fused train-time augmentation.

Flagship config (MobileNetV2 + refinement, 512², batch 16, fp32): the
train step with extra key ``augment`` on vs off, same scan + full-barrier
methodology as bench.py.

Measured (v5e, min-of-3): +2.5 ms = 2.9% with the int-label routing
(ops/augment.apply_augment).  Two rejected variants, kept for the record:
carrying the one-hot label through the flip/gathers +9.8 ms; a single
fused 2-D index gather for the label +58.8 ms (XLA lowers a 2-D index
array to a general gather — per-axis 1-D indexing keeps the fast
slice-like form).

Usage: python tools/augment_bench.py [batch] [size]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _flagship_conf

from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

STEPS, REPEATS = 10, 3


def measure(augment, B, S):
    conf = _flagship_conf(image_size=S, batch_size=B)
    if augment:
        conf.extra["augment"] = {"random_flip": True, "scale_range": [0.5, 2.0]}
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = build_train_step(model, tx, conf)

    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "label": jax.nn.one_hot(
            jnp.asarray(np_rng.integers(0, 21, (B, S, S))), 21
        ),
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    off = measure(False, B, S)
    on = measure(True, B, S)
    print(
        f"flagship {S}² batch {B} fp32 train step: augment OFF {off:.1f} ms, "
        f"ON {on:.1f} ms (+{on - off:.2f} ms, {100 * (on - off) / off:.1f}%)"
    )
