"""Per-site depthwise cost of the Xception bf16 train step vs its HBM floor.

Round-4 VERDICT item 1: the Xception bf16 per-op trace books ~15 ms of the
69 ms step to depthwise convs; this tool measures every depthwise site of
the truncated os16 Xception (reference cut block13_sepconv2_bn,
semantic_segmentation.py:518-520) **individually**, scan-driven in-device
(see PERFORMANCE.md "Measurement integrity"), and compares each against its
pure HBM-traffic floor so the "HBM-bound" claim is checked per site rather
than asserted.

Floor model (stride-1 SAME depthwise, kernel bytes negligible,
S = B*H*W*C*dtype_bytes, v5e HBM ~819 GB/s).  The conv alone:
  fwd      = 2S   (read x, write y)
  fwd+bwd  = 6S   (fwd 2S; dx: read dy, write dx; dk: read x, read dy)
The measured scan body adds harness traffic that cannot fuse away — the
fwd body reduces y (mean, +1S); the f+b body materializes dy from y (+2S)
and reduces gx (+1S) — so ratios are reported against the HARNESS floors
  fwd body = 3S,   fwd+bwd body = 9S:
a ratio near 1.0 means the whole body is at the traffic floor.  The carry
is threaded through the 9·C-element KERNEL, not the input (threading
through x costs a full extra read+write of x per step and was the first
version's mistake — together with short scans under tunnel congestion it
produced a fictitious ~1.6 ms fixed per-op cost).

Usage: python tools/xception_dw_bench.py [bfloat16|float32] [--ablate]

--ablate additionally measures the FULL train step with every depthwise
conv patched to identity (same shapes kept by pointwise convs), giving the
in-context total as a cross-check on the sum of per-site numbers.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax

HBM_GBPS = 819.0  # v5e

# Every depthwise site of truncated Xception (os16) at 512^2 batch 16,
# plus the reference-ASPP dilated sepconv branches (rates 6/12/18 on the
# 256-wide reduction, conf.json encoder_middle_conf_xception).
# (label, (B,H,W,C), dilation, multiplicity)
SITES = [
    ("block2_sepconv1", (16, 253, 253, 64), (1, 1), 1),
    ("block2_sepconv2", (16, 253, 253, 128), (1, 1), 1),
    ("block3_sepconv1", (16, 127, 127, 128), (1, 1), 1),
    ("block3_sepconv2", (16, 127, 127, 256), (1, 1), 1),
    ("block4_sepconv1", (16, 64, 64, 256), (1, 1), 1),
    ("block4_sepconv2", (16, 64, 64, 728), (1, 1), 1),
    ("middle 5-13 (x26)", (16, 32, 32, 728), (1, 1), 26),
    ("aspp rate6", (16, 32, 32, 256), (6, 6), 1),
    ("aspp rate12", (16, 32, 32, 256), (12, 12), 1),
    ("aspp rate18", (16, 32, 32, 256), (18, 18), 1),
]


# MobileNetV2 os16 stride-1 depthwise stages at 512² (the list behind
# depthwise_bench.py GEOMS), for reconciling kernels/depthwise3.py's
# "~0.5 ms in a bf16 step" claim with measured bf16 numbers.
MNV2_SITES = [
    ("expanded_conv", (16, 256, 256, 32), (1, 1), 1),
    ("block_2", (16, 128, 128, 144), (1, 1), 1),
    ("blocks 4-5", (16, 64, 64, 192), (1, 1), 2),
    ("blocks 7-10", (16, 32, 32, 384), (1, 1), 4),
    ("blocks 11-12", (16, 32, 32, 576), (1, 1), 2),
]


def dw(x, k, dil):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def dw9(x, k, dil):
    """Nine-shifted-FMA formulation: pad once, 9 offset slices × per-channel
    tap, summed — pure VPU elementwise work XLA fuses into one loop (no conv
    lowering).  Numerically identical to the SAME depthwise conv."""
    kh, kw = k.shape[0], k.shape[1]
    dh, dw_ = dil
    ph, pw = (kh - 1) // 2 * dh, (kw - 1) // 2 * dw_
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    out = None
    for i in range(kh):
        for j in range(kw):
            tap = xp[:, i * dh : i * dh + H, j * dw_ : j * dw_ + W, :] * k[i, j, 0]
            out = tap if out is None else out + tap
    return out


# Scan lengths long enough that the tunnel's FIXED dispatch+fetch cost
# (~50 ms quiet, ~500+ ms congested — see the probe column) amortizes to
# ≤ ~2 µs/step: a 30-step scan under 500 ms congestion reads ~1.6 ms/step
# of pure tunnel bias, which a first version of this tool mistook for a
# fixed per-op cost.  (int8_probe.py solves the same problem with slope
# timing at two scan lengths; long single scans cost half the compiles.)
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


def bench_fwd(fn, x, k):
    def build(steps):
        def multi():
            def body(acc, _):
                y = fn(x, k + (acc * 1e-30).astype(k.dtype))
                return y.mean().astype(jnp.float32) * 1e-30, None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        return multi

    return timed(build, STEPS_FWD)


def bench_fwdbwd(fn, x, k):
    def loss(x, k, acc):
        return (fn(x, k + (acc * 1e-30).astype(k.dtype)) ** 2).mean().astype(jnp.float32)

    g = jax.grad(loss, (0, 1))

    def build(steps):
        def multi():
            def body(acc, _):
                gx, gk = g(x, k, acc)
                return (gx.mean() + gk.mean()).astype(jnp.float32) * 1e-30, None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        return multi

    return timed(build, STEPS_FB)


def probe():
    x = np.ones((16, 512, 512, 3), np.float32)
    t0 = time.perf_counter()
    jax.device_put(x).block_until_ready()
    return time.perf_counter() - t0


def main():
    dtype = jnp.bfloat16 if (len(sys.argv) > 1 and "bf" in sys.argv[1]) or len(sys.argv) == 1 else jnp.float32
    nbytes = jnp.dtype(dtype).itemsize
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} dtype={jnp.dtype(dtype).name} "
          f"probe={probe()*1e3:.1f}ms", flush=True)

    sites = [] if "--ablate-only" in sys.argv else (
        MNV2_SITES if "--mnv2" in sys.argv else SITES)
    tot_fwd = tot_fb = tot_floor_f = tot_floor_fb = 0.0
    for label, shape, dil, mult in sites:
        B, H, W, C = shape
        S = B * H * W * C * nbytes
        floor_f = 3 * S / (HBM_GBPS * 1e9)  # harness floor: conv 2S + mean 1S
        floor_fb = 9 * S / (HBM_GBPS * 1e9)  # conv f+b 6S + dy 2S + gx mean 1S
        x = jnp.asarray(rng.normal(size=shape), dtype)
        k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, dtype)
        f = functools.partial(dw9 if "--dw9" in sys.argv else dw, dil=dil)
        t_f = bench_fwd(f, x, k)
        t_fb = bench_fwdbwd(f, x, k)
        tot_fwd += mult * t_f
        tot_fb += mult * t_fb
        tot_floor_f += mult * floor_f
        tot_floor_fb += mult * floor_fb
        print(
            f"{label:18s} {str(shape):20s} dil={dil} x{mult:<2d} "
            f"fwd={t_f*1e3:6.3f}ms ({t_f/floor_f:4.1f}x floor) "
            f"f+b={t_fb*1e3:6.3f}ms ({t_fb/floor_fb:4.1f}x floor) "
            f"probe={probe()*1e3:.0f}ms",
            flush=True,
        )
    if sites:
        print(
            f"\nTOTAL (weighted): fwd={tot_fwd*1e3:.2f}ms (floor {tot_floor_f*1e3:.2f}) "
            f"f+b={tot_fb*1e3:.2f}ms (floor {tot_floor_fb*1e3:.2f}, "
            f"{tot_fb/tot_floor_fb:.2f}x)",
            flush=True,
        )

    if "--ablate" in sys.argv or "--ablate-only" in sys.argv:
        ablate(dtype)


def ablate(dtype):
    """Full train step with depthwise patched to identity: the in-context
    depthwise total = (normal step) - (ablated step)."""
    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.config import MiddleOp
    from deeplabv3plus_keras_tpu.models import init_model, blocks
    from deeplabv3plus_keras_tpu.parallel import build_train_step, create_train_state

    def make(conf_dtype, patched):
        conf = _flagship_conf(image_size=512, batch_size=16)
        conf.base_model = "xception"
        conf.hps.dtype = conf_dtype
        conf.nn_arch.encoder_middle_conf = [
            MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
            MiddleOp(op="conv", kernel=3, rate=(6, 6), input=0),
            MiddleOp(op="conv", kernel=3, rate=(12, 12), input=0),
            MiddleOp(op="conv", kernel=3, rate=(18, 18), input=0),
            MiddleOp(op="pyramid_pooling", kernel=1, input=0,
                     target_size_factor=(1, 1)),
        ]
        orig = blocks.depthwise_conv
        if patched:
            def identity_dw(x, k, *, strides=(1, 1), dilation=(1, 1), padding="SAME"):
                # keep shape semantics; consume k so grads exist
                return x * (1.0 + k.astype(x.dtype).sum() * 1e-30)

            blocks.depthwise_conv = identity_dw
        try:
            model, variables = init_model(conf, jax.random.PRNGKey(0))
            state, tx = create_train_state(conf, variables)
            step = build_train_step(model, tx, conf)
        finally:
            blocks.depthwise_conv = orig
        return conf, model, state, step

    np_rng = np.random.default_rng(0)
    B, S = 16, 512
    batch = {
        "image": jnp.asarray(np_rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(np_rng.integers(0, 21, (B, S, S))), 21),
        "valid": jnp.ones((B,), jnp.int32),
    }
    rngk = jax.random.PRNGKey(1)
    name = jnp.dtype(dtype).name
    for patched in (False, True):
        conf, model, state, step = make(name, patched)

        STEPS_ABL = 20

        def multi(state, batch, rngk):
            def body(carry, _):
                st = carry
                st, m = step(st, batch, rngk)
                return st, m["loss"]

            return lax.scan(body, state, None, length=STEPS_ABL)

        jmulti = jax.jit(multi)
        st, losses = jmulti(state, batch, rngk)
        jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            st, losses = jmulti(state, batch, rngk)
            jax.block_until_ready(losses)
            float(losses[-1])
            best = min(best, (time.perf_counter() - t0) / STEPS_ABL)
        print(f"full step ({name}, depthwise {'IDENTITY' if patched else 'real'}): "
              f"{best*1e3:.2f} ms  probe={probe()*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
