"""Honest anatomy of the 87 ms train step: full vs no-CM vs grads-only.

python tools/step_anatomy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timed_scan(make_body, init_carry, steps=10, repeats=2):
    @jax.jit
    def multi(carry):
        return jax.lax.scan(make_body, carry, None, length=steps)

    out = multi(init_carry)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = multi(init_carry)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    S, B = 512, 8
    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.train.loss import SS_NW, SS_PW, class_balanced_loss
    from deeplabv3plus_keras_tpu.train.metrics import confusion_matrix_update
    from deeplabv3plus_keras_tpu.train.optimizer import make_optimizer

    conf = _flagship_conf(image_size=S, batch_size=B)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    params, bs = variables["params"], variables["batch_stats"]
    tx = make_optimizer(conf.hps)
    opt_state = tx.init(params)
    np_rng = np.random.default_rng(0)
    x = jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)
    t = jnp.asarray(np_rng.integers(0, 21, (B, S, S)), jnp.int32)
    y = jax.nn.one_hot(t, 21)
    rng = jax.random.PRNGKey(1)

    def fwd(p, bstats, xx):
        return model.apply(
            {"params": p, "batch_stats": bstats},
            xx,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )

    def loss_fn(p, bstats, xx):
        probs, mut = fwd(p, bstats, xx)
        return class_balanced_loss(y, probs, SS_PW, SS_NW), (probs, mut)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # 1) grads only (carry params so iterations depend)
    def body_g(carry, _):
        p, bstats = carry
        (loss, (probs, mut)), grads = grad_fn(p, bstats, x)
        p2 = jax.tree.map(lambda a, g: a - 1e-9 * g, p, grads)
        return (p2, mut["batch_stats"]), loss

    print("grads+sgd       %.2f ms" % (timed_scan(body_g, (params, bs)) * 1e3), flush=True)

    # 2) grads + adam
    def body_a(carry, _):
        p, bstats, ost = carry
        (loss, (probs, mut)), grads = grad_fn(p, bstats, x)
        updates, ost2 = tx.update(grads, ost, p)
        p2 = optax.apply_updates(p, updates)
        return (p2, mut["batch_stats"], ost2), loss

    print("grads+adam      %.2f ms" % (timed_scan(body_a, (params, bs, opt_state)) * 1e3), flush=True)

    # 3) grads + adam + cm (the full step)
    def body_f(carry, _):
        p, bstats, ost = carry
        (loss, (probs, mut)), grads = grad_fn(p, bstats, x)
        updates, ost2 = tx.update(grads, ost, p)
        p2 = optax.apply_updates(p, updates)
        cm = confusion_matrix_update(y, probs, 21)
        return (p2, mut["batch_stats"], ost2), (loss, cm)

    print("grads+adam+cm   %.2f ms" % (timed_scan(body_f, (params, bs, opt_state)) * 1e3), flush=True)


if __name__ == "__main__":
    main()
