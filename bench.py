"""Benchmark: 512×512 images/sec/chip, combined infer + train step.

Baseline (BASELINE.md): the reference's only quantitative evidence is the
Colab log — MobileNetV2 + boundary refinement, 512², batch 6 on a V100 at
~4 s/step ⇒ ~1.5 images/sec.  This harness measures the same flagship
configuration on one TPU chip:

- train: forward + backward + Adam update + confusion-matrix metric
  (everything a Keras fit step computed), sparse integer labels;
- infer: full softmax-probability forward (the reference predict path);
- labels: the fused Pallas upsample+argmax inference path.

Steps are driven by a ``lax.scan`` inside one jit so the measurement is
pure device throughput, not host/tunnel dispatch latency.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 1.5  # V100 Colab log, BASELINE.md


def run(image_size: int = 512, batch_size: int = 8, steps: int = 30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_label_step,
        build_predict_step,
        build_train_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    conf = _flagship_conf(image_size=image_size, batch_size=batch_size)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    mesh = make_mesh(n_data=1)
    train_step = build_train_step(model, tx, conf)
    predict_step = shard_step(build_predict_step(model), mesh, kind="predict")
    label_step = shard_step(build_label_step(model), mesh, kind="label")

    B = batch_size
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            np_rng.uniform(-1, 1, (B, image_size, image_size, 3)), jnp.float32
        ),
        "label": jnp.asarray(
            np_rng.integers(0, 21, (B, image_size, image_size)), jnp.int32
        ),
        "valid": jnp.ones((B,), jnp.int32),
    }

    @jax.jit
    def multi_train(state, batch, rng):
        def body(s, _):
            s, m = train_step(s, batch, rng)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=steps)

    def timed_once(fn, *args):
        out = fn(*args)  # compile + warm
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    train_time = timed_once(multi_train, state, batch, rng) / steps
    state, _ = multi_train(state, batch, rng)

    def timed_loop(fn, *args, n=steps):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    infer_time = timed_loop(predict_step, state, batch["image"])
    label_time = timed_loop(label_step, state, batch["image"])

    combined = B / (train_time + infer_time)
    return {
        "metric": "512x512 images/sec/chip (infer + train step), MobileNetV2+refinement",
        "value": round(combined, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(combined / BASELINE_IMAGES_PER_SEC, 2),
        "detail": {
            "train_images_per_sec": round(B / train_time, 3),
            "infer_probs_images_per_sec": round(B / infer_time, 3),
            "infer_labels_images_per_sec_pallas": round(B / label_time, 3),
            "train_step_ms": round(train_time * 1e3, 3),
            "batch_size": B,
            "image_size": image_size,
            "device": str(jax.devices()[0]),
        },
    }


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    result = run(image_size=size, batch_size=batch)
    print(json.dumps(result))
