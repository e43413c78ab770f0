"""NASNet-A Mobile / Large backbones, truncated at the reference cut points.

Reference: semantic_segmentation.py:675-712 — Keras ``NASNetMobile`` /
``NASNetLarge`` truncated at ``activation_73``/``activation_132`` (mobile)
and ``activation_97``/``activation_180`` (large).

Those auto-numbered activation layers sit *inside the first/second
post-stem reduction cell*: structurally they are the ReLU at the head of
the ``reduction_right1`` separable branch — i.e. ``relu(p̃)`` where ``p̃``
is the adjusted previous-cell path (relu → 1×1 conv projection → BN) of
reduction cell ``reduce_N`` (os8) / ``reduce_2N`` (os16).  Verified by
introspecting the Keras graph (layer shapes 28×28×88 / 14×14×176 for the
mobile model at 224² — stride 8/16, channels 2·f / 4·f).

NASNet-A wiring (mirrored from the public Keras application):
stem 3×3 s2 VALID conv + BN(mom .9997, eps 1e-3); two stem reduction cells
at f/4 and f/2 filters; then N normal cells (f), reduction (2f), N normal
(2f), reduction (4f), N normal (4f).  Mobile: stem 32, f = 1056/24 = 44,
N = 4; Large: stem 96, f = 4032/24 = 168, N = 6.  Separable blocks:
[relu → sepconv(k, stride) → BN] ×2 (second always stride 1).  Keras's
correct_pad+VALID stride-2 convolutions/pools equal TF SAME padding
arithmetic, so SAME is used; the adjust block's shifted pooling path is a
one-pixel shift + 2× subsample.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..blocks import BatchNorm, DepthwiseConv, QuantConv

he_normal = nn.initializers.he_normal()
_BN_MOM = 0.9997
_BN_EPS = 1e-3


def _correct_pad(x, kernel: int):
    """Keras imagenet_utils.correct_pad: the explicit zero padding applied
    before stride-2 VALID pools/convs ((0,1) on even sizes, (1,1) on odd
    for k=3, etc.)."""
    h, w = x.shape[1], x.shape[2]
    c = kernel // 2
    return ((c - (1 - h % 2), c), (c - (1 - w % 2), c))


def _pool_s2_keras(x, kernel: int, op: str):
    """Keras NASNet stride-2 pooling: ZeroPadding(correct_pad) + VALID pool.

    NOT equivalent to SAME pooling: max pools take max against literal
    zeros at the borders (SAME uses −inf), and the zero-padded VALID avg
    divides by the full window (zeros included).
    """
    (pt, pb), (pl, pr) = _correct_pad(x, kernel)
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    if op == "max":
        return nn.max_pool(xp, (kernel, kernel), strides=(2, 2), padding="VALID")
    return nn.avg_pool(xp, (kernel, kernel), strides=(2, 2), padding="VALID")


def _avg_s1_same_tf(x, kernel: int = 3):
    """TF AveragePooling2D(padding='same', stride 1): padding EXCLUDED from
    the divisor (flax's default includes it)."""
    return nn.avg_pool(
        x, (kernel, kernel), strides=(1, 1), padding="SAME", count_include_pad=False
    )


class _SepBlock(nn.Module):
    """[relu → SeparableConv(k, stride) → BN] ×2 (Keras
    _separable_conv_block)."""

    filters: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, stride in ((1, self.strides), (2, 1)):
            x = nn.relu(x)
            cin = x.shape[-1]
            x = DepthwiseConv(kernel=self.kernel, strides=stride,
                              kernel_init=he_normal, dtype=self.dtype,
                              name=f"separable_conv_{i}_depthwise")(x)
            # QuantConv: float path identical to nn.Conv (int8 gate
            # in ops/quant.py decides per channel counts).
            x = QuantConv(self.filters, kernel=1,
                          kernel_init=he_normal, dtype=self.dtype,
                          name=f"separable_conv_{i}_pointwise")(x)
            x = BatchNorm(momentum=_BN_MOM, epsilon=_BN_EPS, dtype=self.dtype,
                          name=f"separable_conv_{i}_bn")(x, train)
        return x


class _Adjust(nn.Module):
    """Match the previous-path tensor p to the cell input's spatial/channel
    shape (Keras _adjust_block)."""

    filters: int
    dtype: Any = None

    @nn.compact
    def __call__(self, p, ip, train: bool = False):
        if p is None:
            return ip
        if p.shape[-2] != ip.shape[-2]:  # spatial mismatch → strided adjust
            p = nn.relu(p)
            p1 = p[:, ::2, ::2, :]
            p1 = nn.Conv(self.filters // 2, (1, 1), use_bias=False,
                         kernel_init=he_normal, dtype=self.dtype,
                         name="adjust_conv_1")(p1)
            # shift one pixel (drop first row/col, zero-pad at far edge),
            # then 2× subsample — Keras's ZeroPad+Crop+AvgPool(1,2) path.
            p2 = jnp.pad(p[:, 1:, 1:, :], ((0, 0), (0, 1), (0, 1), (0, 0)))
            p2 = p2[:, ::2, ::2, :]
            p2 = nn.Conv(self.filters // 2, (1, 1), use_bias=False,
                         kernel_init=he_normal, dtype=self.dtype,
                         name="adjust_conv_2")(p2)
            p = jnp.concatenate([p1, p2], axis=-1)
            p = BatchNorm(momentum=_BN_MOM, epsilon=_BN_EPS, dtype=self.dtype,
                          name="adjust_bn")(p, train)
        elif p.shape[-1] != self.filters:  # channel mismatch → projection
            p = nn.relu(p)
            p = nn.Conv(self.filters, (1, 1), use_bias=False,
                        kernel_init=he_normal, dtype=self.dtype,
                        name="adjust_conv_projection")(p)
            p = BatchNorm(momentum=_BN_MOM, epsilon=_BN_EPS, dtype=self.dtype,
                          name="adjust_bn")(p, train)
        return p


class _NormalCell(nn.Module):
    filters: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, p, train: bool = False):
        ip = x
        p = _Adjust(self.filters, dtype=self.dtype, name="adjust")(p, ip, train)
        h = nn.relu(ip)
        h = nn.Conv(self.filters, (1, 1), use_bias=False, kernel_init=he_normal,
                    dtype=self.dtype, name="normal_conv_1")(h)
        h = BatchNorm(momentum=_BN_MOM, epsilon=_BN_EPS, dtype=self.dtype,
                      name="normal_bn_1")(h, train)

        sep = lambda inp, k, nm: _SepBlock(self.filters, kernel=k, dtype=self.dtype,
                                           name=nm)(inp, train)
        avg = lambda t: _avg_s1_same_tf(t, 3)

        x1 = sep(h, 5, "normal_left1") + sep(p, 3, "normal_right1")
        x2 = sep(p, 5, "normal_left2") + sep(p, 3, "normal_right2")
        x3 = avg(h) + p
        x4 = avg(p) + avg(p)
        x5 = sep(h, 3, "normal_left5") + h
        out = jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1)
        return out, ip


class _ReductionCell(nn.Module):
    filters: int
    cut_at_right1_relu: bool = False  # reference truncation point
    dtype: Any = None

    @nn.compact
    def __call__(self, x, p, train: bool = False):
        ip = x
        p = _Adjust(self.filters, dtype=self.dtype, name="adjust")(p, ip, train)
        if self.cut_at_right1_relu:
            # activation_73 / _132 / _97 / _180: ReLU feeding the
            # reduction_right1 separable branch.
            return nn.relu(p), ip
        h = nn.relu(ip)
        h = nn.Conv(self.filters, (1, 1), use_bias=False, kernel_init=he_normal,
                    dtype=self.dtype, name="reduction_conv_1")(h)
        h = BatchNorm(momentum=_BN_MOM, epsilon=_BN_EPS, dtype=self.dtype,
                      name="reduction_bn_1")(h, train)

        sep = lambda inp, k, s, nm: _SepBlock(self.filters, kernel=k, strides=s,
                                              dtype=self.dtype, name=nm)(inp, train)
        x1 = sep(h, 5, 2, "reduction_left1") + sep(p, 7, 2, "reduction_right1")
        x2 = _pool_s2_keras(h, 3, "max") + sep(p, 7, 2, "reduction_right2")
        x3 = _pool_s2_keras(h, 3, "avg") + sep(p, 5, 2, "reduction_right3")
        x4 = _avg_s1_same_tf(x1, 3) + x2
        x5 = sep(x1, 3, 1, "reduction_left4") + _pool_s2_keras(h, 3, "max")
        out = jnp.concatenate([x2, x3, x4, x5], axis=-1)
        return out, ip


# skip_reduction: Keras NASNetLarge keeps the pre-reduction p after each
# reduction cell (skip_reduction=True); Mobile takes the reduction's input
# (False) — keras nasnet.py:219/236, 397, 485.
_VARIANTS = {
    "nasnetmobile": dict(stem_filters=32, penultimate=1056, num_blocks=4,
                         skip_reduction=False),
    "nasnetlarge": dict(stem_filters=96, penultimate=4032, num_blocks=6,
                        skip_reduction=True),
}


class NASNetBackbone(nn.Module):
    variant: str = "nasnetmobile"
    output_stride: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _VARIANTS[self.variant]
        filters = cfg["penultimate"] // 24
        N = cfg["num_blocks"]

        x = nn.Conv(cfg["stem_filters"], (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, kernel_init=he_normal, dtype=self.dtype,
                    name="stem_conv1")(x)
        x = BatchNorm(momentum=_BN_MOM, epsilon=_BN_EPS, dtype=self.dtype,
                      name="stem_bn1")(x, train)

        p = None
        x, p = _ReductionCell(filters // 4, dtype=self.dtype,
                              name="stem_1")(x, p, train)
        x, p = _ReductionCell(filters // 2, dtype=self.dtype,
                              name="stem_2")(x, p, train)
        for i in range(N):
            x, p = _NormalCell(filters, dtype=self.dtype, name=f"cell_{i}")(
                x, p, train)

        # os8 cut: inside reduce_N, at relu(adjusted p).
        if self.output_stride == 8:
            cut, _ = _ReductionCell(filters * 2, cut_at_right1_relu=True,
                                    dtype=self.dtype, name=f"reduce_{N}")(x, p, train)
            return cut
        x, p0 = _ReductionCell(filters * 2, dtype=self.dtype,
                               name=f"reduce_{N}")(x, p, train)
        if not cfg["skip_reduction"]:
            p = p0
        for i in range(N):
            x, p = _NormalCell(filters * 2, dtype=self.dtype,
                               name=f"cell_{N + i + 1}")(x, p, train)
        cut, _ = _ReductionCell(filters * 4, cut_at_right1_relu=True,
                                dtype=self.dtype, name=f"reduce_{2 * N}")(x, p, train)
        return cut

    @staticmethod
    def feature_channels(variant: str, output_stride: int) -> int:
        f = _VARIANTS[variant]["penultimate"] // 24
        return f * 2 if output_stride == 8 else f * 4


def _make(variant):
    def ctor(output_stride: int = 16, dtype=None, name="base"):
        return NASNetBackbone(
            variant=variant, output_stride=output_stride, dtype=dtype, name=name
        )

    return ctor


NASNET_BACKBONES = {v: _make(v) for v in _VARIANTS}
