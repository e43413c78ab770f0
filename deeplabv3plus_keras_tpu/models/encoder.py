"""Encoder middle: config-driven ASPP DAG interpreter.

Reference ``_make_encoder`` (semantic_segmentation.py:790-876).  Each entry
of ``encoder_middle_conf`` builds a branch whose input is the backbone
output (``input: -1``) or any earlier branch (``input: k``) — a chainable
DAG strictly more general than parallel-only ASPP.  Ops:

- ``conv`` kernel=1 → 1×1 Conv(reduction_size, l2)+BN+ReLU (:812-821)
- ``conv`` kernel>1 → split separable: SepConv(reduction_size, k,
  dilation=rate×conv_rate_multiplier, TruncatedNormal)+BN+ReLU →
  1×1 Conv(l2)+BN+ReLU (:823-840)
- ``pyramid_pooling`` → AvgPool(pool_size=kernel, valid) → 1×1 Conv(l2)
  +BN+ReLU → bilinear ×target_size_factor (:841-856)

All branch outputs are concatenated, Dropout(dropout_rate), then 1×1
Conv(concat_channels, l2)+BN+ReLU (:862-873).
"""

from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn

from ..config import MiddleOp
from ..ops.resize import tf_resize_images_matmul
from .blocks import ConvBNReLU, SplitSepConvBlock, avg_pool_valid


class EncoderMiddle(nn.Module):
    middle_conf: Sequence[MiddleOp]
    reduction_size: int
    concat_channels: int
    conv_rate_multiplier: int
    dropout_rate: float
    bn_momentum: float
    bn_scale: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, base_features, train: bool = False):
        branches = []
        for i, op in enumerate(self.middle_conf):
            x = base_features if op.input == -1 else branches[op.input]
            if op.op == "conv":
                if op.kernel == 1:
                    x = ConvBNReLU(
                        self.reduction_size,
                        kernel=1,
                        bn_momentum=self.bn_momentum,
                        bn_scale=self.bn_scale,
                        dtype=self.dtype,
                        name=f"branch{i}_conv1x1",
                    )(x, train)
                else:
                    dil = (
                        op.rate[0] * self.conv_rate_multiplier,
                        op.rate[1] * self.conv_rate_multiplier,
                    )
                    x = SplitSepConvBlock(
                        self.reduction_size,
                        kernel=op.kernel,
                        dilation=dil,
                        bn_momentum=self.bn_momentum,
                        bn_scale=self.bn_scale,
                        dtype=self.dtype,
                        name=f"branch{i}_sep",
                    )(x, train)
            elif op.op == "pyramid_pooling":
                x = avg_pool_valid(x, op.kernel)
                x = ConvBNReLU(
                    self.reduction_size,
                    kernel=1,
                    bn_momentum=self.bn_momentum,
                    bn_scale=self.bn_scale,
                    dtype=self.dtype,
                    name=f"branch{i}_pool_conv",
                )(x, train)
                # matmul-form resize: same numerics as K.resize_images,
                # without the pathological conv lowering on tiny pooled
                # maps (5.9 ms → MXU-trivial; see ops/resize.py)
                x = tf_resize_images_matmul(
                    x, op.target_size_factor[0], op.target_size_factor[1]
                )
            else:
                raise ValueError(f"Invalid operation. (op={op.op!r})")
            branches.append(x)

        import jax.numpy as jnp

        x = jnp.concatenate(branches, axis=-1)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train, name="dropout")(x)
        x = ConvBNReLU(
            self.concat_channels,
            kernel=1,
            bn_momentum=self.bn_momentum,
            bn_scale=self.bn_scale,
            dtype=self.dtype,
            name="projection",
        )(x, train)
        return x
