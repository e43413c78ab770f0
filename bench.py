"""Benchmark: 512×512 images/sec/chip, combined infer + train step.

Baseline (BASELINE.md): the reference's only quantitative evidence is the
Colab log — MobileNetV2 + boundary refinement, 512², batch 6 on a V100 at
~4 s/step ⇒ ~1.5 images/sec.  This harness measures the same flagship
configuration's jit-compiled train step (forward + backward + Adam update +
confusion-matrix metric, matching what a Keras fit step computed) plus the
inference step, on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 1.5  # V100 Colab log, BASELINE.md


def run(image_size: int = 512, batch_size: int = 8, steps: int = 10, warmup: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_predict_step,
        build_train_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    from deeplabv3plus_keras_tpu.parallel import build_label_step

    conf = _flagship_conf(image_size=image_size, batch_size=batch_size)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    mesh = make_mesh(n_data=1)
    train_step = shard_step(build_train_step(model, tx, conf), mesh, kind="train")
    predict_step = shard_step(build_predict_step(model), mesh, kind="predict")
    label_step = shard_step(build_label_step(model), mesh, kind="label")

    B = batch_size
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    labels_int = jnp.asarray(np_rng.integers(0, 21, (B, image_size, image_size)), jnp.int32)
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, image_size, image_size, 3)), jnp.float32),
        # sparse integer labels (identical numerics to one-hot; see
        # train/loss.class_balanced_loss_sparse)
        "label": labels_int,
        "valid": jnp.ones((B,), jnp.int32),
    }

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    # Warmup + timed train (state is donated → thread it).
    for _ in range(warmup):
        state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    train_time = time.perf_counter() - t0

    infer_time = timed(predict_step, state, batch["image"])
    label_time = timed(label_step, state, batch["image"])

    train_ips = B * steps / train_time
    infer_ips = B * steps / infer_time
    label_ips = B * steps / label_time
    # Combined metric: one train step + one (probability) infer pass per image.
    combined = B / (train_time / steps + infer_time / steps)

    return {
        "metric": "512x512 images/sec/chip (infer + train step), MobileNetV2+refinement",
        "value": round(combined, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(combined / BASELINE_IMAGES_PER_SEC, 2),
        "detail": {
            "train_images_per_sec": round(train_ips, 3),
            "infer_probs_images_per_sec": round(infer_ips, 3),
            "infer_labels_images_per_sec_pallas": round(label_ips, 3),
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
