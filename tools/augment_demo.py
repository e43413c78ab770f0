"""Measured accuracy value of augmentation + TTA (on-chip demo).

A learnable synthetic segmentation task with a deliberate train→val
distribution shift along exactly the axes augmentation randomizes:

- every image: one colored shape (disk / square, color → class 1..3) on a
  textured background;
- TRAIN distribution: a FINITE pool of 256 images, shape radius 14-18 px,
  center in the LEFT half;
- VAL distribution: fresh images, radius 8-30 px, center anywhere.

Training with ``augment`` (random horizontal flip + scale jitter) should
recover most of the val mIoU the restricted train distribution loses;
``eval_scales``/``eval_flip`` TTA stacks on top.  This is the capability
demonstration for the two beyond-parity recipes (ops/augment.py,
parallel/step._tta_probs_fn) — the reference trains and evaluates with
neither.

Step-count note: evaluation uses BN *running* statistics, and the
backbone's BNs carry the Keras momentum 0.999 (parity with
keras.applications) — from random init they need thousands of updates
before eval-mode inference reflects the trained model at all (0.999^400
≈ 0.67 of the stats still at their (0,1) init → all-background collapse;
the reference behaves identically, and real fine-tuning inherits
converged stats with the ImageNet weights).  Default 2500 steps.

Usage: python tools/augment_demo.py [steps]
Prints one line per arm: val mIoU plain and with TTA.
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from deeplabv3plus_keras_tpu.config import Config, MiddleOp
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import (
    build_eval_step,
    build_train_step,
    create_train_state,
)
from deeplabv3plus_keras_tpu.train import MeanIoU

S = 128
BATCH = 8
N_CLASSES = 4  # background + 3 shape colors
COLORS = np.array(
    [[0.8, -0.5, -0.5], [-0.5, 0.8, -0.5], [-0.5, -0.5, 0.8]], np.float32
)


def make_samples(rng, n, train_dist: bool):
    """n (S,S,3) images in (−1,1) + (S,S) int labels."""
    imgs = np.empty((n, S, S, 3), np.float32)
    labs = np.zeros((n, S, S), np.int32)
    yy, xx = np.mgrid[0:S, 0:S]
    for i in range(n):
        img = rng.uniform(-0.35, 0.35, (S, S, 3)).astype(np.float32)
        if train_dist:
            r = rng.uniform(14, 18)
            cy = rng.uniform(r, S - r)
            cx = rng.uniform(r, S / 2 - r)  # left half only
        else:
            r = rng.uniform(8, 30)
            cy = rng.uniform(r, S - r)
            cx = rng.uniform(r, S - r)
        cls = int(rng.integers(0, 3))
        if rng.uniform() < 0.5:
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
        else:
            mask = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
        img[mask] = COLORS[cls] + rng.uniform(-0.1, 0.1, (mask.sum(), 3))
        imgs[i] = np.clip(img, -1, 1)
        labs[i][mask] = cls + 1
    return imgs, labs


def conf_for(augment: bool) -> Config:
    conf = Config()
    conf.base_model = "mobilenetv2"
    conf.nn_arch.boundary_refinement = True
    conf.nn_arch.output_stride = 16
    conf.nn_arch.image_size = S
    conf.nn_arch.num_classes = N_CLASSES
    conf.nn_arch.reduction_size = 32
    conf.nn_arch.concat_channels = 32
    conf.nn_arch.dropout_rate = 0.1
    conf.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=3, rate=(6, 6), input=0),
    ]
    conf.hps.batch_size = BATCH
    conf.hps.lr = 1e-3
    if augment:
        conf.extra["augment"] = {"random_flip": True, "scale_range": [0.5, 2.0]}
    return conf


def run_arm(augment: bool, steps: int, val_batches):
    conf = conf_for(augment)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = jax.jit(build_train_step(model, tx, conf))
    eval_plain = jax.jit(build_eval_step(model, conf, with_probs=False))
    eval_tta = jax.jit(
        build_eval_step(
            model, conf, with_probs=False,
            tta_scales=[0.75, 1.0, 1.25], tta_flip=True,
        )
    )

    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(3)
    pool_x, pool_y = make_samples(rng, 256, train_dist=True)  # finite train set
    pool_y = np.eye(N_CLASSES, dtype=np.float32)[pool_y]
    t0 = time.time()
    loss = float("nan")
    for _ in range(steps):
        idx = rng.integers(0, len(pool_x), BATCH)
        batch = {
            "image": jnp.asarray(pool_x[idx]),
            "label": jnp.asarray(pool_y[idx]),
            "valid": jnp.ones((BATCH,), jnp.int32),
        }
        state, metrics = train_step(state, batch, key)
        loss = metrics["loss"]
    loss = float(loss)

    def miou_of(eval_step):
        m = MeanIoU(N_CLASSES)
        for batch in val_batches:
            m.update_from_cm(eval_step(state, batch)["cm"])
        return m.result()

    plain, tta = miou_of(eval_plain), miou_of(eval_tta)
    print(
        f"augment={'ON ' if augment else 'OFF'} ({steps} steps, "
        f"{time.time() - t0:.0f}s): final train loss {loss:.4f}, "
        f"val mIoU {plain:.4f}, val mIoU+TTA {tta:.4f}",
        flush=True,
    )
    return plain, tta


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    vrng = np.random.default_rng(1024)
    val_batches = []
    for _ in range(8):  # 64 held-out samples from the WIDE distribution
        x, y = make_samples(vrng, BATCH, train_dist=False)
        val_batches.append(
            {
                "image": jnp.asarray(x),
                "label": jax.nn.one_hot(jnp.asarray(y), N_CLASSES),
                "valid": jnp.ones((BATCH,), jnp.int32),
            }
        )
    off = run_arm(False, steps, val_batches)
    on = run_arm(True, steps, val_batches)
    print(
        f"augmentation lifts held-out mIoU {off[0]:.4f} -> {on[0]:.4f}; "
        f"TTA on top -> {on[1]:.4f}"
    )
