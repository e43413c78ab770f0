"""Decoder + boundary refinement.

Reference ``_make_decoder`` (semantic_segmentation.py:878-913) and
``_refine_boundary`` (:915-954).

Boundary refinement (when on): the reference re-runs the *whole backbone on
the same raw input* a second time (:930) — the "low-level features" are the
identical backbone endpoint, not an earlier layer.  Since weights and input
are identical, both executions produce the same tensor; here the backbone
runs ONCE and its features feed both paths — numerically identical, half
the backbone FLOPs (the reference's ~4 s/step V100 baseline pays for the
double execution).

Refinement: base feats → 1×1 Conv(48, l2)+BN+ReLU (:931-937), both streams
bilinear ×(output_stride/2) (:941-950), concat (:952).  Decoder: 3×3
Conv(num_classes, no bias, l2) (:893-897), bilinear ×output_stride — or ×2
after refinement (os/8 for os=16, os/4 for os=8, :899-902) — then softmax
(:909).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes

from ..ops.fused_upconv import upsample_conv3
from ..ops.resize import tf_resize_images
from .blocks import ConvBNReLU, glorot_uniform


class _RefinedClassifier(nn.Module):
    """upsample×half + 3×3 classifier conv over the CONCAT of the two
    refinement streams — computed as two per-stream convs plus an add
    (conv distributes over input-channel concat), so the (B, S/2, S/2,
    304) concatenated tensor never materializes.  Profiling (round 3)
    showed the concat + its layout copy cost ~4 ms of the 52 ms bf16
    train step (1.27 GB touched twice).  The heavy encoder stream
    additionally fuses its ×half bilinear upsample INTO the conv
    (ops/fused_upconv: composed transposed conv — micro-benchmarked
    1.3× fwd and grad at the flagship shape; the 48-ch low stream
    measured neutral and keeps the plain path).  The parameter stays
    IDENTICAL to the reference's single fused conv (one ``kernel`` of
    shape (3, 3, C_low+C_enc, features) at the same flax path), so
    checkpoints and the Keras weight converter are unaffected.
    """

    features: int
    half: int
    fused: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, low, enc):
        c_low = low.shape[-1]
        kernel = self.param(
            "kernel",
            glorot_uniform,
            (3, 3, c_low + enc.shape[-1], self.features),
            jnp.float32,
        )
        low, enc, kernel = flax_dtypes.promote_dtype(
            low, enc, kernel, dtype=self.dtype
        )

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out = conv(
            tf_resize_images(low, self.half, self.half), kernel[:, :, :c_low]
        )
        if self.fused:
            out = out + upsample_conv3(enc, kernel[:, :, c_low:], self.half)
        else:
            out = out + conv(
                tf_resize_images(enc, self.half, self.half),
                kernel[:, :, c_low:],
            )
        return out


class Decoder(nn.Module):
    num_classes: int
    output_stride: int
    boundary_refinement: bool
    bn_momentum: float
    bn_scale: bool
    dtype: Any = None
    # extra config key 'fused_upconv' (default on): encoder-stream
    # upsample fused into the classifier conv; False = plain two-step
    fused_upconv: bool = True

    @nn.compact
    def __call__(
        self,
        base_features,
        encoder_features,
        train: bool = False,
        return_presample: bool = False,
    ):
        x = encoder_features
        if self.boundary_refinement:
            low = ConvBNReLU(
                48,
                kernel=1,
                bn_momentum=self.bn_momentum,
                bn_scale=self.bn_scale,
                dtype=self.dtype,
                name="refine_conv48",
            )(base_features, train)
            half = self.output_stride // 2
            # reference upsamples both streams, concats, then convs
            # (:941-952, :893); identical math here with the concat
            # eliminated and the encoder-stream upsample fused into the
            # conv (see _RefinedClassifier / ops/fused_upconv)
            x = _RefinedClassifier(
                self.num_classes,
                half=half,
                fused=self.fused_upconv,
                dtype=self.dtype,
                name="classifier_l2",
            )(low, x)
        else:
            x = nn.Conv(
                self.num_classes,
                (3, 3),
                padding="SAME",
                use_bias=False,
                kernel_init=glorot_uniform,
                dtype=self.dtype,
                name="classifier_l2",
            )(x)

        up = self.output_stride
        if self.boundary_refinement:
            up = up // 8 if up == 16 else up // 4  # → ×2 either way (:899-902)
        if return_presample:
            # low-resolution logits + the upsample factor, for fused
            # upsample+argmax consumers (kernels/upsample_argmax).
            return x, up
        x = tf_resize_images(x, up, up)
        return nn.softmax(x, axis=-1)
