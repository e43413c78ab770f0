"""DenseNet-121/169/201 backbones, truncated at the reference's cut points.

Reference: semantic_segmentation.py:713-769 — Keras ``DenseNet{121,169,201}``
truncated at ``pool3_conv`` (output_stride 8) or ``pool4_conv``
(output_stride 16): the 1×1 conv inside the 3rd/4th transition block,
*before* its stride-2 average pool.

Topology facts mirrored from the Keras application: stem 7×7 s2 conv(64) +
BN + ReLU + 3×3 s2 maxpool; dense blocks of [6, 12, 24|32|48, ...] layers
(growth 32; each layer = BN→ReLU→1×1 conv(128)→BN→ReLU→3×3 conv(32),
concat); transitions = BN→ReLU→1×1 conv(×0.5)→2×2 s2 avgpool.  BN eps
1.001e-5.  Cut channels: pool3_conv → 256 (all variants); pool4_conv →
512/640/896 for 121/169/201.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..blocks import BatchNorm, QuantConv, glorot_uniform

_BN_EPS = 1.001e-5

_BLOCKS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}


class DenseLayer(nn.Module):
    growth_rate: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BatchNorm(epsilon=_BN_EPS, dtype=self.dtype, name="0_bn")(x, train)
        y = nn.relu(y)
        # QuantConv: float path identical to nn.Conv; the 1×1 bottleneck
        # (cin grows to 1024, cout 4·growth=128) joins the int8 inference
        # path once cin ≥ 128 (ops/quant.py channel gate).
        y = QuantConv(4 * self.growth_rate, kernel=1,
                      kernel_init=glorot_uniform, dtype=self.dtype, name="1_conv")(y)
        y = BatchNorm(epsilon=_BN_EPS, dtype=self.dtype, name="1_bn")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=glorot_uniform, dtype=self.dtype, name="2_conv")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetBackbone(nn.Module):
    variant: str = "densenet121"
    output_stride: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = _BLOCKS[self.variant]

        # Keras DenseNet pads the stem explicitly: ZeroPadding((3,3)) +
        # 7×7 s2 VALID conv, then ZeroPadding((1,1)) + 3×3 s2 VALID pool —
        # NOT SAME padding (SAME would pad (2,3)/(0,1) on even inputs).
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=glorot_uniform, dtype=self.dtype,
                    name="conv1_conv")(x)
        x = BatchNorm(epsilon=_BN_EPS, dtype=self.dtype, name="conv1_bn")(x, train)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # Dense blocks conv2..convN with transitions pool2..poolN between;
        # cut is inside transition pool3 (os8) or pool4 (os16), pre-pool.
        last_transition = 3 if self.output_stride == 8 else 4
        for bi, n_layers in enumerate(blocks, start=2):
            for li in range(1, n_layers + 1):
                x = DenseLayer(dtype=self.dtype, name=f"conv{bi}_block{li}")(x, train)
            transition_idx = bi  # transition after block convN is poolN
            if transition_idx > last_transition:
                break
            x = BatchNorm(
                epsilon=_BN_EPS, dtype=self.dtype, name=f"pool{transition_idx}_bn"
            )(x, train)
            x = nn.relu(x)
            x = QuantConv(x.shape[-1] // 2, kernel=1,
                          kernel_init=glorot_uniform, dtype=self.dtype,
                          name=f"pool{transition_idx}_conv")(x)
            if transition_idx == last_transition:
                return x  # pre-pool cut (reference pool3_conv/pool4_conv)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        raise AssertionError("cut point not reached")

    @staticmethod
    def feature_channels(variant: str, output_stride: int) -> int:
        blocks = _BLOCKS[variant]
        c = 64
        for bi, n_layers in enumerate(blocks, start=2):
            c += n_layers * 32
            target = 3 if output_stride == 8 else 4
            if bi == target:
                return c // 2
            c //= 2
        raise AssertionError


def _make(variant):
    def ctor(output_stride: int = 16, dtype=None, name="base"):
        return DenseNetBackbone(
            variant=variant, output_stride=output_stride, dtype=dtype, name=name
        )

    return ctor


DENSENET_BACKBONES = {v: _make(v) for v in _BLOCKS}
