"""Post-training int8 quantization for MXU-bound convolutions.

The reference ships a quantizing deployment path (TFLite converter with
``OPTIMIZE_FOR_SIZE``, semantic_segmentation.py:1189-1205); this module is
its on-TPU serving counterpart: inference-only int8 convolution through the
MXU's native s8×s8→s32 path (v5e: 394 int8 TOPS vs 197 bf16 TFLOPS).

Scope is deliberately narrow, driven by on-chip measurement
(tools/int8_probe.py, PERFORMANCE.md): int8 gains 1.6-2× on MXU-bound
convs — Xception's 728-channel pointwise middle flow is the headline case —
and nothing on layout-bound convs (the 21-class decoder classifier measured
dtype-insensitive; MobileNetV2's thin pointwise stack likewise).  Hence the
eligibility gate: both channel counts must reach ``MIN_QUANT_CHANNELS``
(128, one MXU tile side) for a conv to quantize.

Scheme (standard PTQ, maps 1:1 onto the MXU):

- weights: symmetric per-output-channel int8, scales folded on the fly
  from the fp32 master weights (w_q = round(w / s_w), s_w = absmax_c/127);
- activations: symmetric per-tensor int8 with a calibrated scale
  (s_x = absmax/127, absmax recorded over N calibration batches into the
  flax ``quant`` variable collection by :class:`models.blocks.QuantConv`);
- conv in s8×s8 with ``preferred_element_type=int32`` (exact integer
  accumulation), dequantized as y = y_s32 · s_x · s_w[c].

BatchNorm/ReLU around the conv stay in float — they are HBM-bound
elementwise work XLA fuses either way; keeping them out of the integer
pipeline avoids requant error without giving back any MXU time.

Activation of the path is data-driven, not global state: a model apply
that *mutates* the ``quant`` collection is a calibration pass (records
ranges, computes in float); an apply whose variables *contain* ``quant``
runs eligible convs in int8; an apply without ``quant`` is the untouched
float model.  Training never passes ``quant`` (TrainState carries only
params/batch_stats), so the training path is untouched by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Both channel counts must reach one MXU tile side for int8 to pay
# (measured: tools/int8_probe.py — 728×728 pointwise 1.6-2×, the 304→21
# classifier nil).  The round-5 gate-edge probe (--gate-edge) confirmed
# the 128 threshold per geometry: every below-gate member of the excluded
# population measures 0.87-1.01× through the real quantize→conv→dequant
# path — int8 never pays there even before fusion credit.
MIN_QUANT_CHANNELS = 128

# Spatial gate: at large spatial sizes the per-tensor quantize/dequantize
# passes scale with H·W while the MXU win does not — the 127² entry-flow
# pointwise convs measured 0.18× (5× SLOWER) through q/dq standalone
# (tools/int8_probe.py --gate-edge), eroding the middle-flow win.  Sites
# with more than MAX_QUANT_PIXELS spatial positions stay float; None
# disables the gate (tools/int8_spatial_ab.py A/Bs it in-model).
MAX_QUANT_PIXELS: int | None = 4096  # 64² — middle/exit flow at 512² os16


def eligible(cin: int, cout: int, pixels: int | None = None) -> bool:
    """Is a conv with these channel counts (and, when known, this many
    spatial positions) worth quantizing on the MXU?"""
    if min(int(cin), int(cout)) < MIN_QUANT_CHANNELS:
        return False
    if pixels is not None and MAX_QUANT_PIXELS is not None:
        return int(pixels) <= MAX_QUANT_PIXELS
    return True


def quantize_weight_per_channel(w):
    """Symmetric per-output-channel int8: w (kh, kw, cin, cout) fp32 →
    (w_q int8, scale (cout,) fp32)."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)
    return wq, scale


def quantize_activation(x, absmax):
    """Symmetric per-tensor int8 from a calibrated abs-max: returns
    (x_q int8, scale () fp32)."""
    scale = jnp.maximum(absmax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0)
    return xq.astype(jnp.int8), scale


def int8_conv(x, w, in_absmax, *, strides=(1, 1), padding="SAME"):
    """Quantized NHWC/HWIO conv: s8×s8→s32 on the MXU, dequantized to fp32.

    ``in_absmax`` is the calibrated activation range (scalar).  Zero padding
    is exact under symmetric quantization (q(0) = 0), so SAME semantics
    match the float conv's."""
    xq, sx = quantize_activation(x, in_absmax)
    wq, sw = quantize_weight_per_channel(w)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw)


def calibrate(model, variables, batches, train: bool = False):
    """Run ``batches`` of images through the model recording activation
    abs-max ranges; returns the ``quant`` collection to pass to inference
    applies.  Ranges accumulate (running max) across batches.  ``train``
    selects batch-statistics forward mode (mutated stats discarded) for
    models whose BN moving averages are not yet settled."""
    mutable = ["quant", "batch_stats"] if train else ["quant"]
    kwargs = dict(train=train)
    if train:
        kwargs["rngs"] = {"dropout": jax.random.PRNGKey(0)}

    @jax.jit
    def step(vars_, images):
        _, mutated = model.apply(vars_, images, mutable=mutable, **kwargs)
        # flax omits empty collections: {} means no conv passed the
        # channel-eligibility gate anywhere in the model
        return mutated.get("quant", {})

    quant = None
    base = dict(variables)
    for images in batches:
        vars_ = dict(base, quant=quant) if quant else base
        quant = step(vars_, jnp.asarray(images))
    if quant is None:
        raise ValueError("calibrate() needs at least one batch")
    if not quant:
        raise ValueError(
            "no quantizable conv in this model (all sites below "
            f"MIN_QUANT_CHANNELS={MIN_QUANT_CHANNELS}); int8_infer gains "
            "nothing here — unset it"
        )
    return jax.device_get(quant)
