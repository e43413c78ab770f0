"""Benchmark: 512×512 images/sec/chip, combined infer + train step.

Baseline (BASELINE.md): the reference's only quantitative evidence is the
Colab log — MobileNetV2 + boundary refinement, 512², batch 6 on a V100 at
~4 s/step ⇒ ~1.5 images/sec.  This harness measures the same flagship
configuration on one TPU chip:

- train: forward + backward + Adam update + confusion-matrix metric
  (everything a Keras fit step computed), one-hot labels (the sparse
  integer-label path saves HBM but its take_along_axis backward is a
  scatter — measured 2.4× slower on TPU, so dense is the fast path);
- infer: full softmax-probability forward (the reference predict path);
- labels: the fused Pallas upsample+argmax inference path.

Measurement integrity: every timed region drives ``steps`` iterations
through a ``lax.scan`` inside ONE jit and ends with
``jax.block_until_ready`` on the COMPLETE output tree plus a scalar value
fetch.  (Blocking on a single small output — e.g. a loss scalar or step
counter — returns before the heavy tensors complete through the remote
PJRT tunnel and inflates throughput by orders of magnitude; verified with
tools/barrier_check.py.)

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 1.5  # V100 Colab log, BASELINE.md
V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak (bf16 MXU), for the MFU field


def _flops_per_step(step_fn, *args):
    """Model FLOPs of ONE train step from XLA's compiled cost analysis.

    Must be the unscanned step: cost_analysis does not multiply a while/
    scan body by its trip count (measured: the 10-step scan reported less
    than one step's flops), while plain matmul/conv flops are exact on
    this backend (probed within 1%).  None when the backend doesn't
    report flops (e.g. CPU stub runs)."""
    import jax

    try:
        comp = jax.jit(step_fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _xception_aspp():
    """The reference's ``encoder_middle_conf_xception`` (conf.json: rates
    6/12/18 + pyramid_pooling, built at semantic_segmentation.py:841-856) —
    the middle conf the reference actually pairs with the Xception
    backbone.  Since round 5 every Xception bench row uses it (rounds ≤4
    used the flagship MobileNetV2 middle conf; measured within ~2% of each
    other at 512² — see PERFORMANCE.md "Xception flagship")."""
    from deeplabv3plus_keras_tpu.config import MiddleOp

    return [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=3, rate=(6, 6), input=0),
        MiddleOp(op="conv", kernel=3, rate=(12, 12), input=0),
        MiddleOp(op="conv", kernel=3, rate=(18, 18), input=0),
        MiddleOp(op="pyramid_pooling", kernel=1, input=0,
                 target_size_factor=(1, 1)),
    ]


def _addon_rows(
    image_size: int, batch_size: int, steps: int, repeats: int, dtype: str,
    base_model: str = "mobilenetv2", prefix: str = "",
    measure=("train",), int8: bool = False, mfu: bool = False,
    output_stride: int = 16,
):
    """img/s rows for an add-on configuration (bf16 / Xception / int8 /
    output-stride 8), same scan + full-tree-block methodology as the main
    measurement.

    ``measure``: any of 'train'/'infer'. ``int8``: additionally measure the
    PTQ int8 inference path (ops/quant.py; calibrated on the bench batch —
    calibration data is irrelevant to throughput).  ``mfu``: add XLA
    cost-analysis FLOPs + MFU for the train step.  ``output_stride``: 8 is
    the reference's quality mode (semantic_segmentation.py:468) — stride-8
    features are 4× larger, so these rows price the quality lever."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_predict_step,
        build_train_step,
        create_train_state,
    )

    conf = _flagship_conf(image_size=image_size, batch_size=batch_size)
    conf.base_model = base_model
    conf.nn_arch.output_stride = output_stride
    if base_model == "xception":
        conf.nn_arch.encoder_middle_conf = _xception_aspp()
    conf.hps.dtype = dtype
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)

    B = batch_size
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            np_rng.uniform(-1, 1, (B, image_size, image_size, 3)), jnp.float32
        ),
        "label": jax.nn.one_hot(
            jnp.asarray(np_rng.integers(0, 21, (B, image_size, image_size))), 21
        ),
        "valid": jnp.ones((B,), jnp.int32),
    }

    def timed_scan(multi, *args):
        out = multi(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = multi(*args)
            jax.block_until_ready(out)
            scalar = jax.tree.leaves(out)[-1]
            if scalar.ndim > 0:
                scalar = scalar.reshape(-1)[-1]
            float(scalar)
            best = min(best, (time.perf_counter() - t0) / steps)
        return best

    rows = {}
    if "train" in measure:
        train_step = build_train_step(model, tx, conf)

        @jax.jit
        def multi_train(state, batch, rng):
            def body(s, _):
                s, m = train_step(s, batch, rng)
                return s, m["loss"]

            return jax.lax.scan(body, state, None, length=steps)

        t = timed_scan(multi_train, state, batch, rng)
        rows[f"{prefix}train_images_per_sec"] = round(B / t, 3)
        rows[f"{prefix}train_step_ms"] = round(t * 1e3, 3)
        if mfu:
            flops = _flops_per_step(train_step, state, batch, rng)
            if flops is not None:
                rows[f"{prefix}train_model_tflops_per_step"] = round(flops / 1e12, 3)
                rows[f"{prefix}train_mfu_pct_of_v5e_bf16_peak"] = round(
                    100.0 * flops / t / V5E_BF16_PEAK_FLOPS, 2
                )

    def infer_row(key, quant=None):
        predict_step = build_predict_step(model, quant=quant)

        @jax.jit
        def multi_infer(state, images):
            def body(acc, _):
                probs = predict_step(state, images + acc * 1e-30)
                return probs.astype(jnp.float32).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return acc

        t = timed_scan(multi_infer, state, batch["image"])
        rows[key] = round(B / t, 3)
        return t

    if "infer" in measure:
        t_f = infer_row(f"{prefix}infer_images_per_sec")
        if int8:
            from deeplabv3plus_keras_tpu.ops import quant as quant_lib

            q = quant_lib.calibrate(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                [batch["image"]],
            )
            t_q = infer_row(f"{prefix}int8_infer_images_per_sec", quant=q)
            rows[f"{prefix}int8_infer_speedup"] = round(t_f / t_q, 3)
    return rows


def run(image_size: int = 512, batch_size: int = 8, steps: int = 50, repeats: int = 3, dtype: str = "float32", addons: bool = True):
    # steps=50 since round 5: the tunnel's FIXED per-call dispatch+fetch
    # cost (~85 ms quiet, measured by scan-length slope on the Xception
    # bf16 step: 20-step scan 71.0 ms/step, 50-step 68.46 → fixed 84.7 ms,
    # true step 66.8 ms) divided by a 10-step scan inflated every recorded
    # step time by ~5-8 ms.  Longer scans amortize it to ≤1.7 ms; the
    # residual keeps the numbers conservative.  Recorded in the detail as
    # "scan_steps" so rounds are comparable.
    import jax

    # persistent compile cache: repeat bench invocations skip the ~3 min
    # XLA compile of the scanned train step
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_label_step,
        build_predict_step,
        build_train_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    conf = _flagship_conf(image_size=image_size, batch_size=batch_size)
    conf.hps.dtype = dtype
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = build_train_step(model, tx, conf)
    predict_step = build_predict_step(model)
    label_step = build_label_step(model)

    B = batch_size
    rng = jax.random.PRNGKey(1)
    np_rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            np_rng.uniform(-1, 1, (B, image_size, image_size, 3)), jnp.float32
        ),
        "label": jax.nn.one_hot(
            jnp.asarray(np_rng.integers(0, 21, (B, image_size, image_size))), 21
        ),
        "valid": jnp.ones((B,), jnp.int32),
    }

    @jax.jit
    def multi_train(state, batch, rng):
        def body(s, _):
            s, m = train_step(s, batch, rng)
            return s, m["loss"]

        return jax.lax.scan(body, state, None, length=steps)

    @jax.jit
    def multi_infer(state, images):
        def body(acc, _):
            # thread the carry into the input: defeats loop-invariant code
            # motion (the perturbation underflows to zero in fp32, so the
            # computation is numerically the plain forward).
            probs = predict_step(state, images + acc * 1e-30)
            return probs.mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return acc

    @jax.jit
    def multi_label(state, images):
        def body(acc, _):
            labels = label_step(state, images + acc * 1e-30)
            return labels.sum().astype(jnp.float32) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return acc

    def timed(fn, *args):
        out = fn(*args)  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(repeats):  # min over repeats: tunnel load varies
            t0 = time.perf_counter()
            out = fn(*args)
            # block on the COMPLETE output tree (blocking on one small leaf
            # returns early through the remote-PJRT tunnel), but fetch only
            # a scalar — np.asarray of large leaves would time the tunnel
            # transfer, not the compute.
            jax.block_until_ready(out)
            scalar = jax.tree.leaves(out)[-1]
            if scalar.ndim > 0:
                scalar = scalar.reshape(-1)[-1]
            float(scalar)
            best = min(best, (time.perf_counter() - t0) / steps)
        return best

    def tunnel_probe_ms():
        """Host→device put of one batch's bytes: ~8 ms when the shared
        remote-PJRT tunnel is quiet, 20-35× under congestion.  Recorded in
        the detail so each round's snapshot is interpretable."""
        x = np.zeros((B, image_size, image_size, 3), np.uint8)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(x))
            best = min(best, time.perf_counter() - t0)
        return round(best * 1e3, 1)

    probe_ms = tunnel_probe_ms()
    train_time = timed(multi_train, state, batch, rng)
    infer_time = timed(multi_infer, state, batch["image"])
    label_time = timed(multi_label, state, batch["image"])

    combined = B / (train_time + infer_time)
    # MFU (VERDICT r2 item 7): model FLOPs from XLA cost analysis over the
    # measured step time, against the v5e bf16 MXU peak — the utilization
    # number behind the img/s headline.
    flops_step = _flops_per_step(train_step, state, batch, rng)
    mfu = {}
    if flops_step is not None:
        achieved = flops_step / train_time
        mfu = {
            "train_model_tflops_per_step": round(flops_step / 1e12, 3),
            "train_achieved_tflops_per_sec": round(achieved / 1e12, 2),
            "mfu_pct_of_v5e_bf16_peak": round(
                100.0 * achieved / V5E_BF16_PEAK_FLOPS, 2
            ),
        }
    extra = {}
    if addons:
        # the other headline points from PERFORMANCE.md, captured in the
        # driver's BENCH JSON each round (VERDICT r1 weak #4); the full
        # Xception block — bf16, infer, MFU, int8 — is VERDICT r3 item 5
        # (Xception's MXU-bound middle flow is where the chip should show
        # real utilization, and where int8 measured 1.6-2×).
        extra.update(
            _addon_rows(image_size, batch_size, steps, repeats, "bfloat16",
                        prefix="bf16_")
        )
        extra.update(
            _addon_rows(image_size, batch_size, steps, repeats, "float32",
                        base_model="xception", prefix="xception_fp32_",
                        measure=("train", "infer"), int8=True, mfu=True)
        )
        extra.update(
            _addon_rows(image_size, batch_size, steps, repeats, "bfloat16",
                        base_model="xception", prefix="xception_bf16_",
                        measure=("train", "infer"), int8=True, mfu=True)
        )
        # output_stride 8 — the reference's quality mode (stride-8 features
        # are 4× larger; VERDICT r4 item 4b: the quality half of the
        # configuration space needs measured perf, both headline backbones,
        # fp32 + bf16, train + infer).
        # batch 8: stride-8 activations are 4× os16's (Xception middle flow
        # holds 26 × 64²×728 tensors for the backward) — batch 16 would
        # press the 16 GB HBM; img/s rows stay batch-normalized.
        os8_batch = min(batch_size, 8)
        for bm, key in (("mobilenetv2", "mnv2"), ("xception", "xception")):
            for dt in ("float32", "bfloat16"):
                prefix = f"os8_{key}_{'fp32' if dt == 'float32' else 'bf16'}_"
                extra.update(
                    _addon_rows(
                        image_size, os8_batch, steps, repeats, dt,
                        base_model=bm, prefix=prefix,
                        measure=("train", "infer"), output_stride=8,
                    )
                )
                extra[f"{prefix}batch_size"] = os8_batch
    return {
        "metric": "512x512 images/sec/chip (infer + train step), MobileNetV2+refinement",
        "value": round(combined, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(combined / BASELINE_IMAGES_PER_SEC, 2),
        "detail": {
            "train_images_per_sec": round(B / train_time, 3),
            "infer_probs_images_per_sec": round(B / infer_time, 3),
            "infer_labels_images_per_sec_pallas": round(B / label_time, 3),
            "train_step_ms": round(train_time * 1e3, 3),
            "infer_ms": round(infer_time * 1e3, 3),
            "batch_size": B,
            "image_size": image_size,
            "dtype": dtype,
            "scan_steps": steps,
            "device": str(jax.devices()[0]),
            "tunnel_probe_ms": probe_ms,
            # Whether the depthwise Pallas stencils were live for the fp32
            # numbers above (default OFF — measured slower than lax on a
            # real v5e; DLV3_PALLAS_DEPTHWISE=auto opts in) — essential
            # context for interpreting regressions.
            "pallas_depthwise": _pallas_depthwise_active(),
            **mfu,
            **extra,
        },
    }


def _pallas_depthwise_active() -> bool:
    from deeplabv3plus_keras_tpu.kernels.depthwise3 import _pallas_wanted

    return bool(_pallas_wanted())


def _wait_for_backend(attempts: int = 10, probe_timeout_s: int = 120, retry_sleep_s: int = 120) -> None:
    """Bounded wait for the accelerator backend before committing to run().

    The shared remote-PJRT tunnel in this environment flaps: when it is
    down, backend init hangs indefinitely (not an exception), which would
    hang this process and lose the round's snapshot.  Probe device init in
    a SUBPROCESS with a hard timeout (init state is per-process, so a
    hung probe leaves this process clean), retrying for ~20 minutes.
    Proceeds on success or after the last attempt (a local CPU backend
    initializes in seconds and passes on the first probe)."""
    import subprocess

    pin = _platform_pin_stmt()
    probe = pin + "import jax; d = jax.devices(); print(d[0].platform)"
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout_s,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0:
                return
            reason = (r.stderr or "").strip().splitlines()[-1:] or ["nonzero exit"]
            reason = reason[0]
        except subprocess.TimeoutExpired:
            reason = f"init hang >{probe_timeout_s}s (tunnel down?)"
        print(
            f"bench: backend probe {i + 1}/{attempts} failed: {reason}",
            file=sys.stderr,
            flush=True,
        )
        if i + 1 < attempts:
            time.sleep(retry_sleep_s)


def _platform_pin_stmt() -> str:
    """Python statement pinning the JAX platform when DLV3_BENCH_PLATFORM is
    set (e.g. 'cpu' to bench on a CPU host).  The pin must go through
    jax.config — the axon TPU plugin ignores JAX_PLATFORMS."""
    import os

    plat = os.environ.get("DLV3_BENCH_PLATFORM")
    if not plat:
        return ""
    return f"import jax; jax.config.update('jax_platforms', {plat!r}); "


def _apply_platform_pin() -> None:
    """In-process counterpart of _platform_pin_stmt for this process."""
    import os

    plat = os.environ.get("DLV3_BENCH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # batch 16 is the measured throughput-optimal point on one v5e chip
    # (126 vs 117 img/s combined at batch 8; PERFORMANCE.md batch scaling)
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    _apply_platform_pin()
    _wait_for_backend()
    result = run(image_size=size, batch_size=batch, dtype=dtype)
    print(json.dumps(result))
