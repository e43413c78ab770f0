"""MobileNetV2 backbone (ImageNet topology, alpha=1.0), truncated at the
reference's output-stride cut points.

Reference: semantic_segmentation.py:494-509 — Keras ``MobileNetV2`` with
``include_top=False``, truncated at layer ``block_5_add`` (output_stride 8)
or ``block_12_add`` (output_stride 16), renamed 'base', all layers
trainable.

Topology facts mirrored from the Keras application (not its code):
stem Conv 32×3×3 s2 + BN(mom .999, eps 1e-3) + ReLU6; inverted-residual
blocks (expand 6×, depthwise 3×3, linear project) with channel plan
16×1, 24×2(s2), 32×3(s2), 64×4(s2), 96×3, 160×3(s2), 320×1.  Keras's
ZeroPadding2D('correct_pad')+VALID on stride-2 convs is arithmetically
identical to TF/XLA SAME padding, so SAME is used throughout.

Cut 'block_5_add'  = end of the 32-channel group → 32 ch at stride 8.
Cut 'block_12_add' = end of the 96-channel group → 96 ch at stride 16.

Submodule names follow the Keras layer names so pretrained-weight
conversion (tools/convert_keras_weights.py) is a mechanical rename.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..blocks import BatchNorm, DepthwiseConv, glorot_uniform, relu6

_BN_MOMENTUM = 0.999
_BN_EPS = 1e-3


class InvertedResidual(nn.Module):
    """expand(1×1) → depthwise(3×3, stride) → project(1×1, linear)."""

    features: int
    strides: int = 1
    expand_ratio: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        inputs = x
        if self.expand_ratio != 1:
            x = nn.Conv(
                cin * self.expand_ratio,
                (1, 1),
                use_bias=False,
                kernel_init=glorot_uniform,
                dtype=self.dtype,
                name="expand",
            )(x)
            x = BatchNorm(
                momentum=_BN_MOMENTUM, epsilon=_BN_EPS, dtype=self.dtype, name="expand_BN"
            )(x, train)
            x = relu6(x)
        x = DepthwiseConv(
            kernel=3,
            strides=self.strides,
            kernel_init=glorot_uniform,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = BatchNorm(
            momentum=_BN_MOMENTUM, epsilon=_BN_EPS, dtype=self.dtype, name="depthwise_BN"
        )(x, train)
        x = relu6(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            use_bias=False,
            kernel_init=glorot_uniform,
            dtype=self.dtype,
            name="project",
        )(x)
        x = BatchNorm(
            momentum=_BN_MOMENTUM, epsilon=_BN_EPS, dtype=self.dtype, name="project_BN"
        )(x, train)
        if self.strides == 1 and cin == self.features:
            x = x + inputs
        return x


# (features, stride, expand_ratio) per block, Keras block_1..block_16.
_BLOCK_PLAN = [
    (24, 2, 6), (24, 1, 6),                     # block_1, block_2
    (32, 2, 6), (32, 1, 6), (32, 1, 6),         # block_3..block_5   ← os8 cut
    (64, 2, 6), (64, 1, 6), (64, 1, 6), (64, 1, 6),   # block_6..block_9
    (96, 1, 6), (96, 1, 6), (96, 1, 6),         # block_10..block_12 ← os16 cut
    (160, 2, 6), (160, 1, 6), (160, 1, 6),      # block_13..block_15
    (320, 1, 6),                                # block_16
]


class MobileNetV2Backbone(nn.Module):
    """Truncated MobileNetV2 feature extractor.

    output_stride 8 → through block_5 (32 ch); 16 → through block_12 (96 ch).
    """

    output_stride: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            32,
            (3, 3),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            kernel_init=glorot_uniform,
            dtype=self.dtype,
            name="Conv1",
        )(x)
        x = BatchNorm(
            momentum=_BN_MOMENTUM, epsilon=_BN_EPS, dtype=self.dtype, name="bn_Conv1"
        )(x, train)
        x = relu6(x)
        x = InvertedResidual(
            16, strides=1, expand_ratio=1, dtype=self.dtype, name="expanded_conv"
        )(x, train)

        last_block = 5 if self.output_stride == 8 else 12
        for i, (feat, stride, t) in enumerate(_BLOCK_PLAN[:last_block], start=1):
            x = InvertedResidual(
                feat, strides=stride, expand_ratio=t, dtype=self.dtype, name=f"block_{i}"
            )(x, train)
        return x

    @staticmethod
    def feature_channels(output_stride: int) -> int:
        return 32 if output_stride == 8 else 96
