"""Probe: is int8 convolution profitable on this TPU through XLA?

Times the flagship's dominant MXU op (the decoder classifier conv,
B×256×256×304 → 21, k=3 — PERFORMANCE.md "Where the FLOPs are") and an
Xception-middle-flow pointwise conv in fp32, bf16, and int8 (s8×s8→s32
via preferred_element_type).

Decides whether a post-training-quantization inference path is worth
building: int8 doubles the MXU rate over bf16 on paper (v5e: 394 vs 197
TOPS) but only if XLA actually lowers s8 convs to the MXU int path.

Measurement: through this environment's remote-PJRT tunnel every
dispatch carries a fixed ~50 ms cost (PERFORMANCE.md "Measurement
integrity"), so a single scan-of-N timing is floor-dominated for small
N.  This probe times the SAME jitted program at two scan lengths and
reports the slope (t_hi − t_lo)/(N_hi − N_lo): the fixed per-call cost
cancels exactly, leaving the true per-step device time.
"""

from __future__ import annotations

import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LO = 20
N_HI = 100


def wait_for_backend(attempts: int = 8, probe_timeout_s: int = 90) -> None:
    """Bounded wait for working device COMPUTE (not just enumeration —
    a wedged tunnel lists devices fine but hangs the first execution).
    Probes in a subprocess so a hung attempt leaves this process clean."""
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256), jnp.bfloat16);"
        "print(float((x @ x).sum()))"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return
            lines = (r.stderr or b"").decode().strip().splitlines()
            reason = lines[-1] if lines else f"exit {r.returncode}, empty stderr"
        except subprocess.TimeoutExpired:
            reason = f"compute hang >{probe_timeout_s}s (tunnel wedged?)"
        print(f"probe {i + 1}/{attempts} failed: {reason}", file=sys.stderr, flush=True)
        time.sleep(60)
    raise SystemExit("backend never became available")


def timed_s(fn, *args, repeats=3):
    """Total seconds for one call (full-tree barrier + scalar fetch),
    min over repeats."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        s = jax.tree.leaves(out)[-1]
        if s.ndim > 0:
            s = s.reshape(-1)[-1]
        float(s)
        best = min(best, time.perf_counter() - t0)
    return best


def conv_case(name, B, H, W, Cin, Cout, k):
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.uniform(-1, 1, (B, H, W, Cin)), jnp.float32)
    w_f = jnp.asarray(rng.uniform(-1, 1, (k, k, Cin, Cout)), jnp.float32)
    x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, Cin)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (k, k, Cin, Cout)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC"))

    def scan_fn(acc_dtype, steps):
        def scan(x, w):
            def inner(c, _):
                # Thread the carry into the weights through a dynamic
                # predicate that is never true at runtime: defeats
                # loop-invariant code motion for every dtype (int8
                # included, where the bench.py `x + acc*1e-30` trick
                # can't apply).  The select touches only the small
                # weight tensor, so its cost is negligible.
                wp = jnp.where(c > jnp.float32(1e30), w + jnp.ones_like(w), w)
                y = jax.lax.conv_general_dilated(
                    x, wp, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=acc_dtype,
                )
                # Carry dependency through a SMALL slice, not a full-tensor
                # mean: reducing the whole output inside the timed body
                # deflated small-conv TFLOP/s materially (ADVICE r3; dtype
                # RATIOS were unaffected).
                return y[0, 0, 0].astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(inner, jnp.float32(0), None, length=steps)
            return acc

        return jax.jit(scan)

    flops = 2.0 * B * H * W * k * k * Cin * Cout
    rows = []
    for label, (x, w, acc) in {
        "fp32": (x_f, w_f, jnp.float32),
        "bf16": (x_f.astype(jnp.bfloat16), w_f.astype(jnp.bfloat16), jnp.float32),
        "int8": (x_i, w_i, jnp.int32),
    }.items():
        try:
            t_lo = timed_s(scan_fn(acc, N_LO), x, w)
            t_hi = timed_s(scan_fn(acc, N_HI), x, w)
            ms = (t_hi - t_lo) / (N_HI - N_LO) * 1e3
            tops = flops / (ms * 1e-3) / 1e12
            rows.append((label, ms, tops))
        except Exception as e:  # noqa: BLE001 — probe records failures
            rows.append((label, None, str(e).splitlines()[0][:90]))
    print(f"\n{name}: {B}x{H}x{W}x{Cin} -> {Cout}, k={k} ({flops/1e9:.1f} GFLOP)")
    for label, ms, extra in rows:
        if ms is None:
            print(f"  {label:5s}  FAILED: {extra}")
        else:
            print(f"  {label:5s}  {ms:7.3f} ms   {extra:6.1f} TFLOP(or TOP)/s", flush=True)


def qpath_case(name, B, H, W, Cin, Cout, k):
    """The REAL QuantConv inference path from a bf16 activation — quantize
    (calibrated absmax) → s8×s8→s32 conv → dequantize — against the plain
    bf16 conv.  This is the number that decides the eligibility gate: the
    quantize/dequantize elementwise passes cost HBM traffic that the
    pure-int8 probe above does not charge, and at small channel counts the
    conv is traffic-bound so that overhead is the whole story."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from deeplabv3plus_keras_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, Cin)), jnp.bfloat16)
    w32 = jnp.asarray(rng.uniform(-1, 1, (k, k, Cin, Cout)), jnp.float32)
    w16 = w32.astype(jnp.bfloat16)
    absmax = jnp.float32(1.0)
    dn = jax.lax.conv_dimension_numbers(x.shape, w32.shape, ("NHWC", "HWIO", "NHWC"))

    def scan_float(steps):
        def scan(x, w):
            def inner(c, _):
                xp = x + (c * 1e-30).astype(x.dtype)
                y = jax.lax.conv_general_dilated(
                    xp, w, (1, 1), "SAME", dimension_numbers=dn
                )
                return y[0, 0, 0].astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(inner, jnp.float32(0), None, length=steps)
            return acc

        return jax.jit(scan)

    def scan_quant(steps):
        def scan(x, w):
            def inner(c, _):
                xp = x + (c * 1e-30).astype(x.dtype)
                y = int8_conv(xp, w, absmax)
                return y[0, 0, 0].astype(jnp.float32).sum() * 1e-30, None

            acc, _ = jax.lax.scan(inner, jnp.float32(0), None, length=steps)
            return acc

        return jax.jit(scan)

    # Long single scans, not slope timing: under sustained congestion the
    # fixed cost VARIES 100-1000 ms between the two scan lengths, and the
    # slope inherits that variation directly — measured nonsense (negative
    # per-step times) for sub-ms ops.  At N=400 the fixed cost contributes
    # ≤ ~2.5 µs/step however congested.
    N = 400
    rows = []
    for label, (build, wt) in {
        "bf16": (scan_float, w16),
        "int8+q/dq": (scan_quant, w32),
    }.items():
        ms = timed_s(build(N), x, wt) / N * 1e3
        rows.append((label, ms))
    speedup = rows[0][1] / rows[1][1] if rows[1][1] > 0 else float("nan")
    print(f"{name}: {B}x{H}x{W}x{Cin} -> {Cout}, k={k}: "
          f"bf16 {rows[0][1]:.3f} ms vs int8+q/dq {rows[1][1]:.3f} ms "
          f"= {speedup:.2f}x", flush=True)


# The population the MIN_QUANT_CHANNELS=128 gate currently EXCLUDES (thin
# side 64-96: every MobileNetV2 pointwise, the Xception entry sepconv1)
# plus at-the-gate controls (min side exactly 128, incl. the odd-spatial
# entry-flow geometries) — VERDICT r4 item 6: measure the gate's edge
# instead of assuming it.
GATE_EDGE_CASES = [
    ("below pw 96x96 @32²", 16, 32, 32, 96, 96, 1),
    ("below mnv2 expand 96->576 @32²", 16, 32, 32, 96, 576, 1),
    ("below mnv2 project 576->96 @32²", 16, 32, 32, 576, 96, 1),
    ("below xcep entry pw 64->128 @253²", 16, 253, 253, 64, 128, 1),
    ("at-gate pw 128x128 @32²", 16, 32, 32, 128, 128, 1),
    ("at-gate xcep entry pw 128->256 @127²", 16, 127, 127, 128, 256, 1),
    ("at-gate xcep entry pw 256->256 @127²", 16, 127, 127, 256, 256, 1),
    ("above xcep middle pw 728x728 @32²", 16, 32, 32, 728, 728, 1),
]


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    else:
        wait_for_backend()
    print("device:", jax.devices()[0], flush=True)
    if "--gate-edge" in sys.argv:
        for case in GATE_EDGE_CASES:
            qpath_case(*case)
        raise SystemExit(0)
    # flagship classifier conv (decoder, half-res under refinement)
    conv_case("classifier", 16, 256, 256, 304, 21, 3)
    # Xception middle-flow pointwise
    conv_case("xception-pointwise", 16, 32, 32, 728, 728, 1)
    # generic MXU-friendly conv (multiple-of-128 channels)
    conv_case("square128", 16, 64, 64, 128, 128, 3)
