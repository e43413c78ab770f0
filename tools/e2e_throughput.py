"""Sustained END-TO-END training throughput on the real chip: disk →
(native) decode → canvas → on-device preprocessing → sharded train step,
measured over whole epochs (not the device-only step time bench.py
reports).  This is the production number a user feeding real VOC data
sees, including all host/input costs.

python tools/e2e_throughput.py [n_images] [batch] [image_size]
Env: CACHE=0, BACKEND=pil|native|auto to A/B the pipeline options.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    cache = os.environ.get("CACHE", "1") == "1"
    backend = os.environ.get("BACKEND", "auto")  # also: DEVCACHE=1 → HBM-resident dataset
    dtype = os.environ.get("DTYPE", "float32")

    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache: repeat invocations skip the ~1-5 min compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from deeplabv3plus_keras_tpu.config import Config, MiddleOp
    from deeplabv3plus_keras_tpu.data import (
        MODE_TRAIN,
        HostLoader,
        make_synthetic_voc,
        pascal_voc_2012,
    )
    from deeplabv3plus_keras_tpu.data.pipeline import device_batches
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_train_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    root = os.path.join("/tmp", f"e2e_tp_{n_images}_{size}")
    if not os.path.exists(root):
        make_synthetic_voc(
            root, n_train=n_images, n_val=0, n_test=0,
            min_size=int(size * 0.7), max_size=size,
        )
    specs = pascal_voc_2012(root, MODE_TRAIN)[:n_images]

    # flagship config: MobileNetV2 + refinement, 5-branch chained ASPP
    conf = Config()
    conf.base_model = "mobilenetv2"
    conf.nn_arch.image_size = size
    conf.nn_arch.boundary_refinement = True
    conf.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=3, rate=(18, 15), input=0),
        MiddleOp(op="conv", kernel=3, rate=(6, 3), input=1),
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=0),
        MiddleOp(op="conv", kernel=3, rate=(6, 21), input=0),
    ]
    conf.hps.batch_size = batch
    conf.hps.dtype = dtype

    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    mesh = make_mesh(n_data=1)
    train_step = shard_step(build_train_step(model, tx, conf), mesh, kind="train")
    rng = jax.random.PRNGKey(7)

    def epoch():
        loader_iter = device_batches(loader, size, 21)
        nonlocal state
        last = None
        for b in loader_iter:
            b.pop("names")
            state, last = train_step(state, b, rng)
        # Full-tree barrier + actual value fetches from both a big param
        # tensor and the metrics: on this remote-PJRT tunnel,
        # block_until_ready alone can return before the heavy buffers are
        # really materialized (tools/barrier_check.py).
        jax.block_until_ready((state, last))
        float(np.asarray(jax.tree_util.tree_leaves(state.params)[0]).sum())
        float(last["loss"])

    loader = HostLoader(
        specs, batch_size=batch, canvas_size=max(512, size), workers=2,
        max_queue_size=8, cache=cache, backend=backend,
        oversize_target=size, label_clamp=21,
    )
    if os.environ.get("DEVCACHE", "0") == "1":
        from deeplabv3plus_keras_tpu.data.pipeline import DeviceDataset

        loader = DeviceDataset(loader)  # HBM-resident: zero transfer/epoch
    def probe():
        """Tunnel-health probe: host→device put of one batch's bytes.
        ~8 ms when the shared tunnel is quiet; 10× under congestion."""
        x = np.zeros((batch, size, size, 3), np.uint8)
        t0 = time.perf_counter()
        jax.device_put(x).block_until_ready()
        return time.perf_counter() - t0

    t0 = time.time()
    epoch()  # warmup: compile + (if cache) populate
    warm = time.time() - t0
    times, probes = [], []
    for _ in range(6):
        probes.append(probe())
        t0 = time.time()
        epoch()
        times.append(time.time() - t0)
    best = min(times)
    print(
        f"backend={backend} cache={cache} warmup={warm:.1f}s "
        f"epochs={[f'{t:.2f}' for t in times]} "
        f"probes_ms={[f'{p * 1000:.0f}' for p in probes]}"
    )
    print(
        f"e2e train throughput: {n_images / best:.1f} img/s best-of-6 "
        f"({n_images} images, batch {batch}, {size}², {dtype}, incl. input pipeline)"
    )


if __name__ == "__main__":
    main()
