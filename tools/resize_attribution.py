"""Attribute the train step's tf_resize_images device time per call site.

Round-3 profiling (tools/profile_step.py) shows resize.py:172 costing
12.1 ms (9.6 conv-fusion + 2.5 layout) of the ~80 ms fp32 batch-16 step.
Three sites call it under training:

  A. refinement low stream  : conv3x3(resize_x8(B,32,32,48)) -> 21ch
  B. final logits upsample  : resize_x2(B,256,256,21) -> softmax -> loss
  C. encoder pyramid pooling: resize of a pooled (B,hk,wk,256) tile (tiny)

Each is timed fwd+bwd in isolation (value_and_grad of a scalar readout)
with the scan + full-tree-barrier methodology from bench.py.

Usage: python tools/resize_attribution.py  (TPU)
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from deeplabv3plus_keras_tpu.ops.fused_upconv import upsample_conv3
from deeplabv3plus_keras_tpu.ops.resize import tf_resize_images
from deeplabv3plus_keras_tpu.train.loss import class_balanced_loss

B, S = 16, 512
STEPS, REPEATS = 10, 3


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        scalar = jax.tree.leaves(out)[-1]
        float(scalar.reshape(-1)[-1] if scalar.ndim else scalar)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best * 1e3


def scan_grad(body_loss):
    """jit(scan over value_and_grad(body_loss) wrt arg 0): fwd+bwd per
    iteration.  Extra args are passed through as jit arguments (NOT closure
    captures — a closed-over one-hot label tensor becomes a 352 MB jit
    constant, which overflows this environment's remote-compile tunnel)."""

    @jax.jit
    def run(*args):
        def step(acc, _):
            v, g = jax.value_and_grad(body_loss)(*args)
            return acc + v + g.reshape(-1)[0] * 1e-30, None

        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=STEPS)
        return acc

    return run


def probe_ms():
    x = np.zeros((B, S, S, 3), np.uint8)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(x))
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 1)


def main():
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.standard_normal((B, 32, 32, 48)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((B, 32, 32, 256)), jnp.float32)
    k48 = jnp.asarray(rng.standard_normal((3, 3, 48, 21)) * 0.05, jnp.float32)
    k256 = jnp.asarray(rng.standard_normal((3, 3, 256, 21)) * 0.05, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((B, 256, 256, 21)), jnp.float32)
    labels = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 21, (B, S, S))), 21, dtype=jnp.float32
    )

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    print(f"tunnel probe: {probe_ms()} ms (quiet ~8)")

    # A. low stream, plain resize->conv vs fused transposed conv
    a_plain = timed(scan_grad(lambda x: conv(tf_resize_images(x, 8, 8), k48).mean()), low)
    a_fused = timed(scan_grad(lambda x: upsample_conv3(x, k48, 8).mean()), low)
    print(f"A  low  resize_x8+conv (48->21) fwd+bwd : plain {a_plain:6.2f} ms  fused {a_fused:6.2f} ms")

    # A'. encoder stream (what the decoder already fuses), for context
    e_plain = timed(scan_grad(lambda x: conv(tf_resize_images(x, 8, 8), k256).mean()), enc)
    e_fused = timed(scan_grad(lambda x: upsample_conv3(x, k256, 8).mean()), enc)
    print(f"A' enc  resize_x8+conv (256->21) fwd+bwd: plain {e_plain:6.2f} ms  fused {e_fused:6.2f} ms")

    # B. final x2 upsample -> softmax -> class-balanced loss (the train tail)
    def tail(x, y):
        up = tf_resize_images(x, 2, 2)
        probs = jax.nn.softmax(up, axis=-1)
        return class_balanced_loss(y, probs)

    b_full = timed(scan_grad(tail), logits, labels)
    b_resize = timed(scan_grad(lambda x: tf_resize_images(x, 2, 2).mean()), logits)
    b_smloss = timed(
        scan_grad(lambda x, y: class_balanced_loss(y, jax.nn.softmax(x, axis=-1))),
        tf_resize_images(logits, 2, 2),
        labels,
    )
    print(f"B  tail resize_x2+softmax+loss fwd+bwd  : {b_full:6.2f} ms   (resize alone {b_resize:5.2f}, softmax+loss alone {b_smloss:5.2f})")

    # C. pyramid pooling scale (tiny)
    pp = jnp.asarray(rng.standard_normal((B, 2, 2, 256)), jnp.float32)
    c = timed(scan_grad(lambda x: tf_resize_images(x, 16, 16).mean()), pp)
    print(f"C  pyramid-pooling resize fwd+bwd       : {c:6.2f} ms")


if __name__ == "__main__":
    main()
