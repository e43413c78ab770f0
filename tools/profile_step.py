"""Per-op anatomy of the flagship train step from a real jax.profiler trace.

Captures 5 steps under ``jax.profiler.trace`` and aggregates device-lane
op durations by HLO category and by source line — the tool behind the
round-3 decoder-tail findings (resize/concat/copy ≈ 12 ms of the 52 ms
bf16 step) that motivated models/decoder.py + ops/fused_upconv.py.

Usage:  python tools/profile_step.py [bfloat16|float32] [backbone]  (TPU)

``backbone`` defaults to the MobileNetV2 flagship; ``xception`` profiles
the reference's other headline configuration (its ASPP variant: rates
6/12/18 + pyramid_pooling) — the MXU-bound case behind the 18% MFU row
in PERFORMANCE.md.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _flagship_conf
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

STEPS = 5


def capture(dtype: str, logdir: str, backbone: str = "mobilenetv2"):
    S, B = 512, 16
    conf = _flagship_conf(image_size=S, batch_size=B)
    conf.hps.dtype = dtype
    if backbone != "mobilenetv2":
        conf.base_model = backbone
    if backbone == "xception":
        # the reference's xception ASPP (conf.json encoder_middle_conf_xception)
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
    state, tx = create_train_state(conf, variables)
    train_step = jax.jit(build_train_step(model, tx, conf), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "label": jax.nn.one_hot(
            jnp.asarray(np_rng.integers(0, 21, (B, S, S))), 21
        ),
        "valid": jnp.ones((B,), jnp.int32),
    }
    for _ in range(3):  # compile + warm
        state, m = train_step(state, batch, rng)
    jax.block_until_ready(m)
    with jax.profiler.trace(logdir):
        for _ in range(STEPS):
            state, m = train_step(state, batch, rng)
        jax.block_until_ready(m)


def report(logdir: str, top: int = 20):
    (path,) = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    )[-1:]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category")
        if cat is None:
            continue
        by_cat[cat] += e["dur"]
        src = args.get("source", "?").split("/")[-1]
        by_src[(cat, src)] += e["dur"]
        by_op[(e["name"], src)] += e["dur"]

    print(f"\nper-step device time by HLO category (us/{STEPS}):")
    for c, us in by_cat.most_common():
        print(f"{us/STEPS/1e3:8.2f} ms  {c}")
    print("\ntop (category, source) per step:")
    for (c, s), us in by_src.most_common(top):
        print(f"{us/STEPS/1e3:8.2f} ms  {c:22s} {s}")
    print("\ntop individual ops per step:")
    for (n, s), us in by_op.most_common(top):
        print(f"{us/STEPS/1e3:8.2f} ms  {n[:48]:48s} {s}")


if __name__ == "__main__":
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    backbone = sys.argv[2] if len(sys.argv) > 2 else "mobilenetv2"
    logdir = f"/tmp/profile_step_{backbone}_{dtype}"
    capture(dtype, logdir, backbone)
    report(logdir)
