"""Component-level TPU timing: backbone vs encoder vs decoder vs train step,
fp32 vs bf16 — drives the Pallas fusion priorities (SURVEY §7 step 8).

Usage: python tools/tpu_profile.py [image_size] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.models.backbones import get_backbone
    from deeplabv3plus_keras_tpu.parallel import (
        build_train_step, create_train_state, make_mesh, shard_step,
    )

    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    x = jnp.asarray(np_rng.uniform(-1, 1, (B, size, size, 3)), jnp.float32)
    labels = jax.nn.one_hot(jnp.asarray(np_rng.integers(0, 21, (B, size, size))), 21)

    for dtype in ("float32", "bfloat16"):
        conf = _flagship_conf(image_size=size, batch_size=B)
        conf.hps.dtype = dtype

        bb = get_backbone("mobilenetv2", 16, dtype=jnp.bfloat16 if dtype == "bfloat16" else None)
        bvars = bb.init({"params": rng}, x[:1], train=False)
        t_bb = timeit(jax.jit(lambda v, x: bb.apply(v, x, train=False)), bvars, x)

        model, variables = init_model(conf, rng)
        t_fwd = timeit(jax.jit(lambda v, x: model.apply(v, x, train=False)), variables, x)

        state, tx = create_train_state(conf, variables)
        mesh = make_mesh(n_data=1)
        tstep = shard_step(build_train_step(model, tx, conf), mesh, kind="train")
        batch = {"image": x, "label": labels, "valid": jnp.ones((B,), jnp.int32)}

        def run_step(state):
            s, m = tstep(state, batch, rng)
            return s, m["loss"]

        # manual loop timing (state is donated)
        for _ in range(2):
            state, loss = run_step(state)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(10):
            state, loss = run_step(state)
        jax.block_until_ready(loss)
        t_train = (time.perf_counter() - t0) / 10

        print(
            f"{dtype}: backbone_fwd {t_bb*1e3:.2f}ms  full_fwd {t_fwd*1e3:.2f}ms "
            f"(enc+dec {(t_fwd-t_bb)*1e3:.2f}ms)  train_step {t_train*1e3:.2f}ms "
            f"→ {B/t_train:.0f} img/s train, {B/t_fwd:.0f} img/s infer"
        )


if __name__ == "__main__":
    main()
