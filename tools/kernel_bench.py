"""Honest Pallas upsample+argmax benchmark vs the XLA resize+argmax path
(scan-driven, carry-threaded inputs, full-output barriers).

python tools/kernel_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.kernels import upsample_argmax, upsample_argmax_reference


def timed(fn, x, s, steps=20, repeats=3):
    @jax.jit
    def multi(x):
        def body(acc, _):
            labels = fn(x + acc * 1e-30, s)
            return labels.sum().astype(jnp.float32) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return acc

    out = multi(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = multi(x)
        jax.block_until_ready(out)
        float(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    rng = np.random.default_rng(0)
    for shape, s in [((8, 256, 256, 21), 2), ((8, 32, 32, 21), 16)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        agree = (
            np.asarray(upsample_argmax(x, s))
            == np.asarray(upsample_argmax_reference(x, s))
        ).mean()
        t_p = timed(upsample_argmax, x, s)
        t_r = timed(upsample_argmax_reference, x, s)
        print(
            f"{shape} s={s}: agree={agree:.6f} pallas={t_p*1e3:.3f}ms "
            f"xla={t_r*1e3:.3f}ms speedup={t_r/t_p:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
