"""EfficientNet B0–B7 backbones, truncated at the reference's cut points.

Reference: semantic_segmentation.py:526-674 — Keras ``EfficientNetB{0..7}``
with ``include_top=False`` truncated at the last block-add of stage 3
(output_stride 8) or stage 5 (output_stride 16):

    B0: block3b_add / block5c_add      B4: block3d_add / block5f_add
    B1: block3c_add / block5d_add      B5: block3e_add / block5g_add
    B2: block3c_add / block5d_add      B6: block3f_add / block5h_add
    B3: block3c_add / block5e_add      B7: block3g_add / block5j_add

(the per-variant letters are exactly ceil(depth_coefficient × base_repeats)
blocks, so the cut is simply "end of stage N" — implemented that way).

Topology facts mirrored from the Keras application: the model *includes
input preprocessing* — Rescaling(1/255) + Normalization(ImageNet mean/std)
— before the stem, so the reference feeds its (−1,1)-normalized images
through a second normalization; mirrored for behavioral parity.  Stem:
round_filters(32) 3×3 s2 + BN + swish.  MBConv block: expand 1×1 (ratio 6;
stage 1 ratio 1) + BN + swish → depthwise k×k + BN + swish → SE (ratio
0.25 of *input* filters) → project 1×1 + BN → stochastic-depth + add when
shapes match (drop_connect_rate 0.2 scaled by block index).  Stage plan
(kernel, base_repeats, base_filters, stride, expand):
(3,1,16,1,1) (3,2,24,2,6) (5,2,40,2,6) (3,3,80,2,6) (5,3,112,1,6)
(5,4,192,2,6) (3,1,320,1,6).  BN eps 1e-3, momentum 0.99; swish
activation; width rounding to a divisor of 8.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..blocks import BatchNorm, DepthwiseConv, QuantConv

# Keras EfficientNet conv kernel init: variance scaling (2.0, fan_out,
# truncated normal).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


# (width_coefficient, depth_coefficient) per variant.
_VARIANTS = {
    "efficientnetb0": (1.0, 1.0),
    "efficientnetb1": (1.0, 1.1),
    "efficientnetb2": (1.1, 1.2),
    "efficientnetb3": (1.2, 1.4),
    "efficientnetb4": (1.4, 1.8),
    "efficientnetb5": (1.6, 2.2),
    "efficientnetb6": (1.8, 2.6),
    "efficientnetb7": (2.0, 3.1),
}

# (kernel, base_repeats, base_filters_out, stride, expand_ratio)
_STAGES = [
    (3, 1, 16, 1, 1),
    (3, 2, 24, 2, 6),
    (5, 2, 40, 2, 6),
    (3, 3, 80, 2, 6),
    (5, 3, 112, 1, 6),
    (5, 4, 192, 2, 6),
    (3, 1, 320, 1, 6),
]


def round_filters(filters: float, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class MBConv(nn.Module):
    features_out: int
    kernel: int
    strides: int
    expand_ratio: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        inputs = x
        expanded = cin * self.expand_ratio
        if self.expand_ratio != 1:
            # QuantConv: float path identical to nn.Conv; wide expand/
            # project 1x1 convs join the int8 inference path when both
            # channel counts pass the gate (ops/quant.py).
            x = QuantConv(expanded, kernel=1, kernel_init=conv_init,
                          dtype=self.dtype, name="expand_conv")(x)
            x = BatchNorm(dtype=self.dtype, name="expand_bn")(x, train)
            x = nn.swish(x)
        x = DepthwiseConv(kernel=self.kernel, strides=self.strides,
                          kernel_init=conv_init, dtype=self.dtype,
                          name="dwconv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        x = nn.swish(x)

        # Squeeze-excite on the expanded features, bottleneck sized from
        # the block *input* filters.
        se_filters = max(1, int(cin * self.se_ratio))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_filters, (1, 1), kernel_init=conv_init,
                     dtype=self.dtype, name="se_reduce")(se)
        se = nn.swish(se)
        se = nn.Conv(expanded, (1, 1), kernel_init=conv_init,
                     dtype=self.dtype, name="se_expand")(se)
        x = x * nn.sigmoid(se)

        x = QuantConv(self.features_out, kernel=1,
                      kernel_init=conv_init, dtype=self.dtype, name="project_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="project_bn")(x, train)

        if self.strides == 1 and cin == self.features_out:
            if self.drop_rate > 0.0:
                # Keras Dropout(noise_shape=(None,1,1,1)) = stochastic depth.
                x = nn.Dropout(
                    rate=self.drop_rate,
                    broadcast_dims=(1, 2, 3),
                    deterministic=not train,
                    name="drop",
                )(x)
            x = x + inputs
        return x


class EfficientNetBackbone(nn.Module):
    """Truncated EfficientNet: stages 1..3 (os8) or 1..5 (os16)."""

    variant: str = "efficientnetb0"
    output_stride: int = 16
    drop_connect_rate: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth = _VARIANTS[self.variant]

        # Keras-internal preprocessing: the reference's (−1,1) inputs go
        # through Rescaling(1/255) + a Normalization layer again (:526-674).
        # The Normalization stats are *weights* in the Keras model (filled
        # from the pretrained .h5; identity mean=0/var=1 when random) —
        # stored here as batch_stats so the weight converter carries them.
        x = x / 255.0
        norm_mean = self.variable(
            "batch_stats", "normalization_mean", lambda: jnp.zeros((3,), jnp.float32)
        )
        norm_var = self.variable(
            "batch_stats", "normalization_var", lambda: jnp.ones((3,), jnp.float32)
        )
        x = (x - norm_mean.value) / jnp.sqrt(norm_var.value + 1e-7)

        x = nn.Conv(round_filters(32, width), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name="stem_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="stem_bn")(x, train)
        x = nn.swish(x)

        last_stage = 3 if self.output_stride == 8 else 5
        total_blocks = sum(round_repeats(r, depth) for _, r, _, _, _ in _STAGES)
        block_idx = 0
        for stage_i, (k, base_r, base_f, stride, expand) in enumerate(_STAGES, start=1):
            if stage_i > last_stage:
                break
            repeats = round_repeats(base_r, depth)
            fout = round_filters(base_f, width)
            for r in range(repeats):
                drop = self.drop_connect_rate * block_idx / total_blocks
                x = MBConv(
                    features_out=fout,
                    kernel=k,
                    strides=stride if r == 0 else 1,
                    expand_ratio=expand,
                    drop_rate=drop,
                    dtype=self.dtype,
                    name=f"block{stage_i}{chr(ord('a') + r)}",
                )(x, train)
                block_idx += 1
        return x

    @staticmethod
    def feature_channels(variant: str, output_stride: int) -> int:
        width, _ = _VARIANTS[variant]
        base = 40 if output_stride == 8 else 112
        return round_filters(base, width)


def _make(variant):
    class _EfficientNet(EfficientNetBackbone):
        pass

    _EfficientNet.__name__ = f"EfficientNetBackbone_{variant}"

    def ctor(output_stride: int = 16, dtype=None, name="base"):
        return EfficientNetBackbone(
            variant=variant, output_stride=output_stride, dtype=dtype, name=name
        )

    return ctor


EFFICIENTNET_BACKBONES = {v: _make(v) for v in _VARIANTS}
