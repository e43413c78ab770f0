"""End-to-end training demonstration at full scale on one TPU chip:
the flagship 512² model overfits a synthetic 64-image dataset; loss and
mIoU trajectories prove the whole train path (model, loss, Adam, BN
stats, CM metric) optimizes at speed.

python tools/tpu_train_demo.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    B, S = 8, 512

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_train_step,
        create_train_state,
        make_mesh,
        shard_step,
    )
    from deeplabv3plus_keras_tpu.train import MeanIoU

    conf = _flagship_conf(image_size=S, batch_size=B)
    conf.hps.lr = 3e-4
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    step = shard_step(build_train_step(model, tx, conf), make_mesh(n_data=1), kind="train")

    # Synthetic learnable data: blocky label regions correlated with image
    # content (labels are a function of the image → learnable).
    rng = np.random.default_rng(0)
    blocky = rng.integers(0, 21, (B, S // 64, S // 64)).astype(np.int32)
    labels_idx = np.repeat(np.repeat(blocky, 64, 1), 64, 2)
    palette = rng.uniform(-1, 1, (21, 3)).astype(np.float32)
    images = palette[labels_idx] + rng.normal(0, 0.3, (B, S, S, 3)).astype(np.float32)
    batch = {
        "image": jnp.asarray(images, jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(labels_idx), 21),
        "valid": jnp.ones((B,), jnp.int32),
    }
    key = jax.random.PRNGKey(7)

    t0 = time.time()
    for i in range(1, steps + 1):
        state, m = step(state, batch, key)
        if i % max(1, steps // 10) == 0 or i == 1:
            miou = MeanIoU(21).update_from_cm(np.asarray(m["cm"])).result()
            print(
                f"step {i:4d}  loss {float(m['loss']):.4f}  batch mIoU {miou:.4f}",
                flush=True,
            )
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    print(f"{steps} steps in {dt:.1f}s incl. compile ({B*steps/dt:.1f} img/s wall)", flush=True)


if __name__ == "__main__":
    main()
