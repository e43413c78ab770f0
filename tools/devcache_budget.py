"""Measure the cache_device HBM fit on the real chip (VERDICT r2 item 3).

The axon TPU plugin reports NO memory_stats (measured: empty dict), so the
auto budget (_auto_hbm_budget = free/2) cannot engage on this tunnel device
and `cache_device_max_bytes` is the operative control.  This tool finds the
actual max-N empirically: builds the flagship train state (MobileNetV2 +
refinement, 512^2, batch 16), then sweeps the resident-cache size upward,
after each allocation running a REAL train step gathered from the cache
(activations + cache must coexist); the first RESOURCE_EXHAUSTED is caught
and the last success reported.

Run: python tools/devcache_budget.py  (TPU; one process at a time)
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _flagship_conf
from deeplabv3plus_keras_tpu.data.pipeline import _auto_hbm_budget
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.ops.preprocess import prepare_batch_from_cache
from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

SIZE, B = 512, 16
BPS = SIZE * SIZE * 4  # img u8x3 + label u8 per sample


def main():
    print("memory_stats:", jax.devices()[0].memory_stats(), flush=True)
    print("auto_budget:", _auto_hbm_budget(), flush=True)

    conf = _flagship_conf(image_size=SIZE, batch_size=B)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = jax.jit(build_train_step(model, tx, conf))

    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    warm = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, SIZE, SIZE, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(np_rng.integers(0, 21, (B, SIZE, SIZE))), 21),
        "valid": jnp.ones((B,), jnp.int32),
    }
    state, m = train_step(state, warm, rng)
    jax.block_until_ready(m)
    print("flagship train step compiled+run OK", flush=True)

    idx = jnp.arange(B, dtype=jnp.int32)
    valid = jnp.ones((B,), jnp.int32)
    best = None
    for gib in (4, 6, 8, 10, 11, 12, 13, 14):
        n = int(gib * 2**30) // BPS
        try:
            imgs = jax.device_put(np.zeros((n, SIZE, SIZE, 3), np.uint8))
            labs = jax.device_put(np.zeros((n, SIZE, SIZE), np.uint8))
            sizes = jax.device_put(np.full((n, 2), SIZE, np.int32))
            jax.block_until_ready((imgs, labs, sizes))
            t0 = time.perf_counter()
            im, lb = prepare_batch_from_cache(
                imgs, labs, sizes, idx, valid, size=SIZE, num_classes=21,
                with_labels=True, one_hot_labels=True,
            )
            state, m = train_step(
                state, {"image": im, "label": lb, "valid": valid}, rng
            )
            jax.block_until_ready(m)
            float(m["loss"])
            dt = time.perf_counter() - t0
            print(f"N={n} ({gib} GiB cache): train step OK ({dt*1e3:.0f} ms)",
                  flush=True)
            best = (n, gib)
            del imgs, labs, sizes, im, lb
        except Exception as e:
            print(f"N={n} ({gib} GiB cache): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break
    if best:
        print(f"MAX-N at 512^2 with flagship batch-16 training resident: "
              f">= {best[0]} samples ({best[1]} GiB)", flush=True)


if __name__ == "__main__":
    main()
