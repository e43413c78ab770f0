"""Xception backbone (ImageNet topology), truncated at the reference's
output-stride cut points.

Reference: semantic_segmentation.py:510-525 — Keras ``Xception`` with
``include_top=False``, truncated at ``block4_sepconv2_bn`` (output_stride 8,
728 ch, pre-pool) or ``block13_sepconv2_bn`` (output_stride 16, 1024 ch,
pre-pool), renamed 'base'.

Topology facts mirrored from the Keras application: entry flow
conv1 32×3×3 s2 VALID + conv2 64×3×3 VALID (both BN+ReLU), then three
residual-downsample blocks (128, 256, 728) of sepconv pairs + MaxPool 3×3
s2 SAME with 1×1 s2 conv shortcuts; middle flow = 8 blocks of
3×(ReLU→sepconv 728→BN) with identity residual; exit block13 =
ReLU→sepconv 728→BN→ReLU→sepconv 1024→BN.  BN eps 1e-3, momentum 0.99.
Cut points land *before* the block's pool, matching the Keras layer-name
truncation.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..blocks import BatchNorm, QuantConv, SeparableConv, glorot_uniform

_BN_MOMENTUM = 0.99


class XceptionBackbone(nn.Module):
    output_stride: int = 16
    dtype: Any = None

    def _bn(self, name):
        return BatchNorm(momentum=_BN_MOMENTUM, dtype=self.dtype, name=name)

    def _sepconv(self, features, name):
        return SeparableConv(features, kernel=3, dtype=self.dtype, name=name)

    def _conv(self, features, strides, name, kernel=3, padding="VALID"):
        # QuantConv: float path identical to nn.Conv; the wide 1×1
        # residual shortcuts join the int8 inference path when calibrated
        # (ops/quant.py — the stem convs fail the channel gate and stay
        # float automatically).
        return QuantConv(
            features,
            kernel=kernel,
            strides=strides,
            padding=padding,
            kernel_init=glorot_uniform,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Entry flow stem (VALID padding, like the Keras application).
        x = self._conv(32, 2, "block1_conv1")(x)
        x = self._bn("block1_conv1_bn")(x, train)
        x = nn.relu(x)
        x = self._conv(64, 1, "block1_conv2")(x)
        x = self._bn("block1_conv2_bn")(x, train)
        x = nn.relu(x)

        # block2: sepconv 128 ×2 + pool, conv shortcut.
        res = self._conv(128, 2, "conv2d", kernel=1, padding="SAME")(x)
        res = self._bn("batch_normalization")(res, train)
        x = self._sepconv(128, "block2_sepconv1")(x)
        x = self._bn("block2_sepconv1_bn")(x, train)
        x = nn.relu(x)
        x = self._sepconv(128, "block2_sepconv2")(x)
        x = self._bn("block2_sepconv2_bn")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = x + res

        # block3: relu-first sepconv 256 ×2 + pool, conv shortcut.
        res = self._conv(256, 2, "conv2d_1", kernel=1, padding="SAME")(x)
        res = self._bn("batch_normalization_1")(res, train)
        x = nn.relu(x)
        x = self._sepconv(256, "block3_sepconv1")(x)
        x = self._bn("block3_sepconv1_bn")(x, train)
        x = nn.relu(x)
        x = self._sepconv(256, "block3_sepconv2")(x)
        x = self._bn("block3_sepconv2_bn")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = x + res

        # block4: relu-first sepconv 728 ×2 — os8 cut is at sepconv2's BN,
        # *before* the ReLU/pool/residual (Keras 'block4_sepconv2_bn').
        res = self._conv(728, 2, "conv2d_2", kernel=1, padding="SAME")(x)
        res = self._bn("batch_normalization_2")(res, train)
        y = nn.relu(x)
        y = self._sepconv(728, "block4_sepconv1")(y)
        y = self._bn("block4_sepconv1_bn")(y, train)
        y = nn.relu(y)
        y = self._sepconv(728, "block4_sepconv2")(y)
        y = self._bn("block4_sepconv2_bn")(y, train)
        if self.output_stride == 8:
            return y
        x = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        x = x + res

        # Middle flow: blocks 5-12, identity residual.
        for b in range(5, 13):
            res = x
            for s in range(1, 4):
                x = nn.relu(x)
                x = self._sepconv(728, f"block{b}_sepconv{s}")(x)
                x = self._bn(f"block{b}_sepconv{s}_bn")(x, train)
            x = x + res

        # block13 head up to sepconv2_bn — the os16 cut (pre-pool).
        x = nn.relu(x)
        x = self._sepconv(728, "block13_sepconv1")(x)
        x = self._bn("block13_sepconv1_bn")(x, train)
        x = nn.relu(x)
        x = self._sepconv(1024, "block13_sepconv2")(x)
        x = self._bn("block13_sepconv2_bn")(x, train)
        return x

    @staticmethod
    def feature_channels(output_stride: int) -> int:
        return 728 if output_stride == 8 else 1024
