"""Batch-1 serving LATENCY for the two headline backbones (p50-style min
and mean over in-device iterations), complementing bench.py's throughput
rows: production serving cares about single-request latency, which batch-16
throughput numbers hide.

Method matches bench.py's integrity rules (PERFORMANCE.md "Measurement
integrity"): the label step (fused Pallas upsample+argmax — the segment()
path) runs in a lax.scan inside one jit with a carry data dependency, the
full output tree is blocked on and fetched, and a device_put tunnel probe
brackets each timing so congested-tunnel numbers are identifiable.

python tools/latency_bench.py            # both backbones, fp32 + bf16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

# 400 iterations: the tunnel's FIXED per-call dispatch cost (~85 ms quiet,
# measured round 5 by scan-length slope) divided by 50 iterations added
# ~1.7 ms to every recorded batch-1 latency — a 2x overstatement of a
# ~2 ms step.  At 400 the bias is ~0.2 ms.
ITERS = 400
REPEATS = 3


def tunnel_probe_ms() -> float:
    x = np.zeros((256, 256), np.float32)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(x))
    return (time.perf_counter() - t0) * 1e3


def measure(backbone: str, dtype: str, size: int = 512, output_stride: int = 16) -> dict:
    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel.step import (
        build_label_step,
        create_train_state,
    )

    conf = _flagship_conf(image_size=size, batch_size=1)
    conf.hps.dtype = dtype
    conf.nn_arch.output_stride = output_stride
    if backbone != "mobilenetv2":
        conf.base_model = backbone
    if backbone == "xception":
        from deeplabv3plus_keras_tpu.config import MiddleOp

        conf.nn_arch.encoder_middle_conf = [
            MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
            MiddleOp(op="conv", kernel=3, rate=(6, 6), input=0),
            MiddleOp(op="conv", kernel=3, rate=(12, 12), input=0),
            MiddleOp(op="conv", kernel=3, rate=(18, 18), input=0),
            MiddleOp(op="pyramid_pooling", kernel=1, input=0,
                     target_size_factor=(1, 1)),
        ]
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, _ = create_train_state(conf, variables)
    label_step = build_label_step(model)

    @jax.jit
    def run(state, x0):
        def body(x, _):
            lab = label_step(state, x)
            # carry depends on the output so scan iterations serialize
            x = x + (lab[..., None].astype(x.dtype) * 0.0)
            return x, lab[0, 0, 0]

        _, outs = jax.lax.scan(body, x0, None, length=ITERS)
        return outs

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, size, size, 3)), jnp.float32
    )
    jax.block_until_ready(run(state, x0))  # compile + warm
    times = []
    for _ in range(REPEATS):
        probe = tunnel_probe_ms()
        t0 = time.perf_counter()
        out = run(state, x0)
        jax.block_until_ready(out)
        _ = np.asarray(out[-1])
        times.append(((time.perf_counter() - t0) * 1e3 / ITERS, probe))
    best_ms, probe = min(times)
    return {
        "backbone": backbone,
        "dtype": dtype,
        "output_stride": output_stride,
        "latency_ms": round(best_ms, 2),
        "tunnel_probe_ms": round(probe, 1),
    }


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    strides = (16, 8) if "--os8" in sys.argv else (16,)
    for output_stride in strides:
        for backbone in ("mobilenetv2", "xception"):
            for dtype in ("float32", "bfloat16"):
                r = measure(backbone, dtype, output_stride=output_stride)
                print(r, flush=True)


if __name__ == "__main__":
    main()
