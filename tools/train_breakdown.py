"""Train-step cost breakdown on TPU: model bwd vs loss tail.

python tools/train_breakdown.py [size] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *a, n=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.train.loss import (
        SS_NW,
        SS_PW,
        class_balanced_loss,
        class_balanced_loss_sparse,
    )

    conf = _flagship_conf(image_size=S, batch_size=B)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    params, bs = variables["params"], variables["batch_stats"]
    np_rng = np.random.default_rng(0)
    x = jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    t_int = jnp.asarray(np_rng.integers(0, 21, (B, S, S)), jnp.int32)
    y = jax.nn.one_hot(t_int, 21)
    rng = jax.random.PRNGKey(1)

    def fwd(p, xx):
        probs, _ = model.apply(
            {"params": p, "batch_stats": bs},
            xx,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return probs

    g_dummy = jax.jit(lambda p, xx: jax.grad(lambda q: jnp.sum(fwd(q, xx)))(p))
    print("grad(sum probs)  %.3f ms" % (timeit(g_dummy, params, x) * 1e3), flush=True)

    g_dense = jax.jit(
        lambda p, xx, yy: jax.grad(
            lambda q: class_balanced_loss(yy, fwd(q, xx), SS_PW, SS_NW)
        )(p)
    )
    print("grad(dense loss) %.3f ms" % (timeit(g_dense, params, x, y) * 1e3), flush=True)

    g_sparse = jax.jit(
        lambda p, xx, tt: jax.grad(
            lambda q: class_balanced_loss_sparse(tt, fwd(q, xx), SS_PW, SS_NW)
        )(p)
    )
    print(
        "grad(sparse loss) %.3f ms" % (timeit(g_sparse, params, x, t_int) * 1e3),
        flush=True,
    )


if __name__ == "__main__":
    main()
