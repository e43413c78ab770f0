"""Direct vs tap-major classifier conv on TPU at the real decoder shape.

python tools/conv_race.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.kernels.tap_major_conv import tap_major_conv3x3_same


def timed_scan(fn, x, k, steps=20):
    @jax.jit
    def multi(x, k):
        def body(acc, _):
            # carry-threaded input defeats loop-invariant code motion
            return fn(x + acc * 1e-30, k).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return acc

    out = multi(x, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = multi(x, k)
    jax.block_until_ready(out)
    float(out)
    return (time.perf_counter() - t0) / steps


def main():
    B, H, W, CIN, COUT = 8, 256, 256, 304, 21
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)), jnp.float32)

    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    a = np.asarray(direct(x, k))
    b = np.asarray(tap_major_conv3x3_same(x, k))
    print("maxdiff", np.abs(a - b).max(), flush=True)

    t_d = min(timed_scan(direct, x, k) for _ in range(3))
    print(f"direct    {t_d*1e3:.3f} ms", flush=True)
    t_t = min(timed_scan(tap_major_conv3x3_same, x, k) for _ in range(3))
    print(f"tap-major {t_t*1e3:.3f} ms  speedup {t_d/t_t:.2f}x", flush=True)

    # gradient (the training cost): d/dk sum(sin(conv))
    for name, fn in [("direct", direct), ("tap-major", tap_major_conv3x3_same)]:
        g = jax.grad(lambda kk, xx: jnp.sum(jnp.sin(fn(xx, kk))).astype(jnp.float32), argnums=0)

        @jax.jit
        def multig(x, k, g=g):
            def body(acc, _):
                gg = g(k, x + acc * 1e-30)
                return gg.mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return acc

        out = multig(x, k)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = multig(x, k)
        jax.block_until_ready(out)
        float(out)
        print(f"grad {name}: {(time.perf_counter()-t0)/10*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
