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
from ..ops.resize import tf_resize_images, tf_resize_images_matmul
from .blocks import ConvBNReLU, glorot_uniform


class _RefinedClassifier(nn.Module):
    """upsample×half + 3×3 classifier conv over the CONCAT of the two
    refinement streams (reference :941-952 upsample+concat, :893-897
    conv), computed as ONE composed transposed conv on the LOW-RES
    concat: both streams live at the same stride-os spatial size, so
    concatenating there costs ~7 MB instead of the reference's
    (B, S/2, S/2, 304) high-res concat, and the ×half bilinear upsample
    folds into the conv (ops/fused_upconv) so neither upsampled stream
    ever materializes.  Profiling history: round 3 first eliminated the
    high-res concat by splitting into two per-stream convs (conv
    distributes over input-channel concat) and fusing only the encoder
    stream; per-site measurement (tools/resize_attribution.py) then
    showed the remaining plain low-stream resize+conv cost 7.9 ms
    fwd+bwd at the flagship shape — merging both streams into one fused
    call removes it.  The parameter stays IDENTICAL to the reference's
    single fused conv (one ``kernel`` of shape (3, 3, C_low+C_enc,
    features) at the same flax path), so checkpoints and the Keras
    weight converter are unaffected.
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

        if self.fused:
            return upsample_conv3(
                jnp.concatenate([low, enc], axis=-1), kernel, self.half
            )

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # reference-literal two-step path: per-stream upsample + conv
        # (distributed over the concat), kept as the fallback/oracle
        out = conv(
            tf_resize_images(low, self.half, self.half), kernel[:, :, :c_low]
        )
        return out + conv(
            tf_resize_images(enc, self.half, self.half), kernel[:, :, c_low:]
        )


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
        # Final upsample form is chosen per compute dtype, both measured
        # on the v5e at the flagship shape (tools/profile_step.py + A/B
        # scan): in fp32 the conv lowering of this one site cost 7.9 ms
        # conv + 3.3 ms layout copies per train step and the matmul form
        # (two MXU contractions, exact same <=2-tap lerp) takes ~4.5 ms
        # off the step; in bf16 the conv lowering is the faster one
        # (matmul-form step regressed 53.5 -> 56.2 ms), so bf16 keeps it.
        if jnp.dtype(x.dtype) in (jnp.float32, jnp.float64):
            x = tf_resize_images_matmul(x, up, up)
        else:
            x = tf_resize_images(x, up, up)
        return nn.softmax(x, axis=-1)
