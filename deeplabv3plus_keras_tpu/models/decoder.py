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

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import tf_resize_images
from .blocks import ConvBNReLU, glorot_uniform


class Decoder(nn.Module):
    num_classes: int
    output_stride: int
    boundary_refinement: bool
    bn_momentum: float
    bn_scale: bool
    dtype: Any = None

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
            low = tf_resize_images(low, half, half)
            x = tf_resize_images(x, half, half)
            x = jnp.concatenate([low, x], axis=-1)

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
