"""Cost of the decoder tail (upsample ×2 → softmax → class-balanced loss)
fwd+bwd in XLA, isolated — the upper bound a fused Pallas kernel could save.

python tools/tail_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.ops.resize import tf_resize_images
from deeplabv3plus_keras_tpu.train.loss import SS_NW, SS_PW, class_balanced_loss


def main():
    B, h, C, steps = 8, 256, 21, 20
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, h, h, C)), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, C, (B, 2 * h, 2 * h))), C)

    def tail(logits):
        up = tf_resize_images(logits, 2, 2)
        probs = jax.nn.softmax(up, axis=-1)
        return class_balanced_loss(y, probs, SS_PW, SS_NW)

    grad = jax.grad(tail)

    @jax.jit
    def multi(logits):
        def body(carry, _):
            g = grad(logits + carry * 1e-30)
            return g.mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return acc

    out = multi(logits)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(logits)
        jax.block_until_ready(out)
        float(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"tail fwd+bwd (XLA): {best*1e3:.3f} ms per batch-8 step", flush=True)


if __name__ == "__main__":
    main()
