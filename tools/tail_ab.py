"""A/B the decoder's final ×2 logits upsample forms in bf16 (and fp32).

Round-5 finding (tools/profile_step.py bfloat16 xception): the final ×2
bilinear upsample of the (16,256,256,21) logits costs 2.92 ms of conv
fusion + 2.30 ms of layout transposes in the bf16 train step — ~19× the
~0.27 ms read+write traffic floor (21 channels pad to 128 lanes, and the
lhs-dilated conv lowering shuffles layouts on both sides).  Candidates:

  conv    jax.image.resize (XLA conv lowering — the current bf16 choice)
  matmul  tf_resize_images_matmul (two MXU interpolation contractions —
          the current fp32 choice)
  shift   f=2 specialization: per-phase 2-tap lerp via edge-shifted
          slices, phases interleaved by stack+reshape — pure elementwise
          (no conv, no matmul, no gather)

Measures fwd and fwd+bwd per form, scan-driven in-device (long scans;
see xception_dw_bench.py for why), plus max|Δ| vs the conv form.

Usage: python tools/tail_ab.py [bfloat16|float32]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax

from deeplabv3plus_keras_tpu.ops.resize import (
    tf_resize_images,
    tf_resize_images_matmul,
    tf_resize_images_x2_shift,
)

STEPS_FWD = 400
STEPS_FB = 200


def timed(build, steps, repeats=3):
    multi = jax.jit(build(steps))
    out = multi()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = multi()
        jax.block_until_ready(out)
        float(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def bench(fn, x, seed):
    # thread the carry through a scalar perturbation of a SMALL constant
    # multiplier so the big tensor is not re-written by the harness
    def build_fwd(steps):
        def multi():
            def body(acc, _):
                y = fn(x * (1.0 + acc * 1e-30).astype(x.dtype))
                return y.mean().astype(jnp.float32) * 1e-30, None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        return multi

    def loss(x, acc):
        return (fn(x * (1.0 + acc * 1e-30).astype(x.dtype)) ** 2).mean().astype(
            jnp.float32
        )

    g = jax.grad(loss, 0)

    def build_fb(steps):
        def multi():
            def body(acc, _):
                gx = g(x, acc)
                return gx.mean().astype(jnp.float32) * 1e-30, None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        return multi

    return timed(build_fwd, STEPS_FWD), timed(build_fb, STEPS_FB)


def main():
    dtype = (
        jnp.float32
        if len(sys.argv) > 1 and "f32" in sys.argv[1].replace("float32", "f32")
        else jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    B, H, W, C = 16, 256, 256, 21
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), dtype)
    S_in = B * H * W * C * jnp.dtype(dtype).itemsize
    floor_fwd = 5 * S_in / 819e9  # read x + write 4S out
    print(
        f"backend={jax.default_backend()} dtype={jnp.dtype(dtype).name} "
        f"shape={x.shape} x2: fwd traffic floor ~{floor_fwd*1e3:.3f} ms",
        flush=True,
    )
    forms = {
        "conv  ": lambda t: tf_resize_images(t, 2, 2),
        "matmul": lambda t: tf_resize_images_matmul(t, 2, 2),
        "shift ": lambda t: tf_resize_images_x2_shift(t),
    }
    ref = np.asarray(forms["conv  "](x), np.float32)
    for name, fn in forms.items():
        diff = float(np.max(np.abs(np.asarray(fn(x), np.float32) - ref)))
        t_f, t_fb = bench(fn, x, 0)
        print(
            f"{name}: fwd={t_f*1e3:6.3f}ms ({t_f/floor_fwd:4.1f}x floor) "
            f"f+b={t_fb*1e3:6.3f}ms  max|Δ| vs conv={diff:.2e}",
            flush=True,
        )


def instep():
    """Full Xception bf16 train-step A/B: final-upsample form conv (the
    current bf16 choice) vs matmul (the fp32 choice).  The op standalone
    costs ~1 ms either way, but IN-STEP the conv lowering drags 2.3 ms of
    layout transposes with it (profile_step) — this measures whether the
    matmul form's layout composes better inside the big program."""
    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.config import MiddleOp
    from deeplabv3plus_keras_tpu.models import init_model, decoder as dec_mod
    from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state
    from deeplabv3plus_keras_tpu.ops.resize import tf_resize_images as conv_form

    def make(tail):
        conf = _flagship_conf(image_size=512, batch_size=16)
        conf.base_model = "xception"
        conf.hps.dtype = "bfloat16"
        conf.nn_arch.encoder_middle_conf = [
            MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
            MiddleOp(op="conv", kernel=3, rate=(6, 6), input=0),
            MiddleOp(op="conv", kernel=3, rate=(12, 12), input=0),
            MiddleOp(op="conv", kernel=3, rate=(18, 18), input=0),
            MiddleOp(op="pyramid_pooling", kernel=1, input=0,
                     target_size_factor=(1, 1)),
        ]
        orig = dec_mod.tf_resize_images
        if tail == "matmul":
            dec_mod.tf_resize_images = tf_resize_images_matmul
        try:
            model, variables = init_model(conf, jax.random.PRNGKey(0))
            state, tx = create_train_state(conf, variables)
            step = build_train_step(model, tx, conf)
        finally:
            dec_mod.tf_resize_images = orig
        return state, step

    np_rng = np.random.default_rng(0)
    B, S = 16, 512
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(np_rng.integers(0, 21, (B, S, S))), 21),
        "valid": jnp.ones((B,), jnp.int32),
    }
    rngk = jax.random.PRNGKey(1)
    STEPS = 50
    for tail in ("conv", "matmul"):
        state, step = make(tail)

        def multi(state, batch, rngk):
            def body(carry, _):
                st, m = step(carry, batch, rngk)
                return st, m["loss"]

            return lax.scan(body, state, None, length=STEPS)

        jmulti = jax.jit(multi)
        st, losses = jmulti(state, batch, rngk)
        jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            st, losses = jmulti(state, batch, rngk)
            jax.block_until_ready(losses)
            float(losses[-1])
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f"xception bf16 train step, tail={tail}: {best*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    if "--instep" in sys.argv:
        instep()
    else:
        main()
