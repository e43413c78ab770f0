"""Honest Pallas depthwise-3×3 benchmark vs the lax grouped-conv path.

Measures fwd and fwd+bwd on the flagship MobileNetV2 depthwise
geometries (512² input, os16), scan-driven with carry-threaded inputs
and full-output barriers plus a value fetch (see PERFORMANCE.md
"Measurement integrity"), min-of-3 against tunnel noise, with a
device_put probe so congested samples are visible.

python tools/depthwise_bench.py [nhwc|bhcw]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1:
    os.environ["DLV3_DW_LAYOUT"] = sys.argv[1]

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from deeplabv3plus_keras_tpu.kernels import (
    depthwise3x3,
    depthwise3x3_reference,
    depthwise3x3_s2,
    depthwise3x3_s2_reference,
)

# Every stride-1 depthwise stage of the truncated MobileNetV2 os16
# backbone (through block_12) at 512², (B,H,W,C).  Stride-2 sites
# (256²C96, 128²C144, 64²C192) are measured by the polyphase section below.
GEOMS = [
    (16, 256, 256, 32),  # expanded_conv
    (16, 128, 128, 144),  # block_2
    (16, 64, 64, 192),  # blocks 4-5
    (16, 32, 32, 384),  # blocks 7-10
    (16, 32, 32, 576),  # blocks 11-12
]


def probe():
    x = np.ones((16, 512, 512, 3), np.float32)
    t0 = time.perf_counter()
    jax.device_put(x).block_until_ready()
    return time.perf_counter() - t0


def timed(build, steps=20, repeats=3):
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


def bench_fwd(fn, x, k, steps=20):
    def build(steps):
        def multi():
            def body(acc, _):
                y = fn(x + acc * 1e-30, k)
                return y.mean().astype(jnp.float32) * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        return multi

    return timed(build, steps)


def bench_fwdbwd(fn, x, k, steps=20):
    def loss(x, k, acc):
        return (fn(x + acc * 1e-30, k) ** 2).mean()

    g = jax.grad(loss, (0, 1))

    def build(steps):
        def multi():
            def body(acc, _):
                gx, gk = g(x, k, acc)
                return (gx.mean() + gk.mean()).astype(jnp.float32) * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        return multi

    return timed(build, steps)


def main():
    rng = np.random.default_rng(0)
    print(
        f"backend={jax.default_backend()} "
        f"layout={os.environ.get('DLV3_DW_LAYOUT', 'nhwc')} "
        f"probe={probe()*1e3:.1f}ms",
        flush=True,
    )
    # Stage multiplicity of each geometry in the os16 backbone.
    weights = [1, 1, 2, 4, 2]
    tot_p = tot_r = tot_pb = tot_rb = 0.0
    for shape, wmul in zip(GEOMS, weights):
        B, H, W, C = shape
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)
        agree = float(
            jnp.abs(depthwise3x3(x, k) - depthwise3x3_reference(x, k)).max()
        )
        t_p = bench_fwd(depthwise3x3, x, k)
        t_r = bench_fwd(depthwise3x3_reference, x, k)
        t_pb = bench_fwdbwd(depthwise3x3, x, k)
        t_rb = bench_fwdbwd(depthwise3x3_reference, x, k)
        tot_p += wmul * t_p
        tot_r += wmul * t_r
        tot_pb += wmul * t_pb
        tot_rb += wmul * t_rb
        print(
            f"{shape}: maxdiff={agree:.2e} fwd pallas={t_p*1e3:.3f}ms "
            f"lax={t_r*1e3:.3f}ms ({t_r/t_p:.2f}x) | fwd+bwd "
            f"pallas={t_pb*1e3:.3f}ms lax={t_rb*1e3:.3f}ms ({t_rb/t_pb:.2f}x) "
            f"probe={probe()*1e3:.1f}ms",
            flush=True,
        )
    print(
        f"TOTAL stride-1 (stage-weighted): fwd pallas={tot_p*1e3:.2f}ms "
        f"lax={tot_r*1e3:.2f}ms | fwd+bwd pallas={tot_pb*1e3:.2f}ms "
        f"lax={tot_rb*1e3:.2f}ms",
        flush=True,
    )

    # Stride-2 sites (polyphase kernel): block_1/3/6 at 512² os16.
    s2_tot_pb = s2_tot_rb = 0.0
    for shape in [(16, 256, 256, 96), (16, 128, 128, 144), (16, 64, 64, 192)]:
        B, H, W, C = shape
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)
        agree = float(
            jnp.abs(depthwise3x3_s2(x, k) - depthwise3x3_s2_reference(x, k)).max()
        )
        t_p = bench_fwd(depthwise3x3_s2, x, k)
        t_r = bench_fwd(depthwise3x3_s2_reference, x, k)
        t_pb = bench_fwdbwd(depthwise3x3_s2, x, k)
        t_rb = bench_fwdbwd(depthwise3x3_s2_reference, x, k)
        s2_tot_pb += t_pb
        s2_tot_rb += t_rb
        print(
            f"s2 {shape}: maxdiff={agree:.2e} fwd pallas={t_p*1e3:.3f}ms "
            f"lax={t_r*1e3:.3f}ms ({t_r/t_p:.2f}x) | fwd+bwd "
            f"pallas={t_pb*1e3:.3f}ms lax={t_rb*1e3:.3f}ms ({t_rb/t_pb:.2f}x) "
            f"probe={probe()*1e3:.1f}ms",
            flush=True,
        )
    print(
        f"TOTAL stride-2: fwd+bwd pallas={s2_tot_pb*1e3:.2f}ms "
        f"lax={s2_tot_rb*1e3:.2f}ms",
        flush=True,
    )

    # Dilated ASPP branches (flagship encoder at 512² os16: 32², C96/C256,
    # rates (18,15)/(6,3)/(6,21)) and one Xception middle-flow stage.
    import functools

    import jax.lax as lax

    from deeplabv3plus_keras_tpu.kernels import depthwise_stencil

    def dilated_ref(dil):
        def f(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", rhs_dilation=dil,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1],
            )
        return f

    extra = [
        ((16, 32, 32, 96), (18, 15)),
        ((16, 32, 32, 256), (6, 3)),
        ((16, 32, 32, 256), (6, 21)),
        ((16, 64, 64, 728), (1, 1)),  # Xception middle flow
    ]
    for shape, dil in extra:
        B, H, W, C = shape
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)
        pal = functools.partial(depthwise_stencil, dilation=dil)
        ref = dilated_ref(dil)
        agree = float(jnp.abs(pal(x, k) - ref(x, k)).max())
        t_pb = bench_fwdbwd(pal, x, k)
        t_rb = bench_fwdbwd(ref, x, k)
        print(
            f"dil={dil} {shape}: maxdiff={agree:.2e} fwd+bwd "
            f"pallas={t_pb*1e3:.3f}ms lax={t_rb*1e3:.3f}ms "
            f"({t_rb/t_pb:.2f}x) probe={probe()*1e3:.1f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
