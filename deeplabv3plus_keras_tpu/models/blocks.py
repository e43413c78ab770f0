"""NN primitive blocks (NHWC, functional flax.linen).

These mirror the reference's Keras building blocks numerically:

- Keras ``Conv2D`` default kernel init is glorot_uniform; layers the
  reference builds with ``initializers.TruncatedNormal()`` use stddev 0.05.
- Keras ``BatchNormalization`` defaults: eps 1e-3, center=True; the
  encoder/decoder BNs take ``momentum=hps['bn_momentum']`` and
  ``scale=hps['bn_scale']`` (reference semantic_segmentation.py:819, :831).
- "Split separable conv" (reference :823-840) = SeparableConv2D(C, k,
  dilation)+BN+ReLU followed by 1×1 Conv(C)+BN+ReLU, where SeparableConv2D
  itself is depthwise(k, dilation) → pointwise 1×1.

Weight-decay parity: Keras attaches ``l2(weight_decay)`` regularizers to
specific conv kernels only (reference :817, :838, :845, :866, :893, :931).
Here those convs are flax submodules named with the ``_l2`` suffix; the
training loss adds ``wd * Σ‖W‖²`` over params whose path matches (see
train/loss.py), reproducing both the loss value and the gradient.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from ..kernels.depthwise3 import depthwise_conv
from ..ops import quant

# Keras glorot_uniform / TruncatedNormal(stddev=0.05) equivalents.
glorot_uniform = nn.initializers.glorot_uniform()
truncated_normal_05 = nn.initializers.truncated_normal(stddev=0.05, lower=-2.0, upper=2.0)


class DepthwiseConv(nn.Module):
    """Depthwise conv, drop-in for ``nn.Conv(cin, feature_group_count=cin)``.

    Identical param tree (one ``kernel`` of HWIO shape (k, k, 1, C), same
    init semantics, no bias) and identical lax lowering — but routed through
    :func:`kernels.depthwise3.depthwise_conv`, so eligible fp32 3×3 stride-1
    SAME sites run the Pallas VPU stencil on single-chip TPU instead of
    XLA's ~3-pass bf16 decomposition of fp32 convs.
    """

    kernel: int = 3
    strides: int = 1
    dilation: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    kernel_init: Callable = glorot_uniform
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel, self.kernel, 1, cin),
            self.param_dtype,
        )
        x, k = nn.dtypes.promote_dtype(x, k, dtype=self.dtype)
        return depthwise_conv(
            x,
            k,
            strides=(self.strides, self.strides),
            dilation=self.dilation,
            padding=self.padding,
        )


class QuantConv(nn.Module):
    """``nn.Conv(use_bias=False)`` drop-in with an int8 PTQ inference path.

    Identical param tree (one HWIO ``kernel``, same inits) and a float path
    that lowers to the exact same ``lax.conv_general_dilated`` call as
    ``nn.Conv`` — weight transplants and all float numerics are unchanged.
    The quantized path (ops/quant.py) engages per-apply, driven by the
    ``quant`` variable collection:

    - collection mutable (``mutable=['quant']``) → calibration pass:
      records the input's abs-max running maximum, computes in float;
    - collection present in variables → eligible convs (both channel
      counts ≥ 128, see ops/quant.MIN_QUANT_CHANNELS) run s8×s8→s32 on
      the MXU and dequantize;
    - collection absent (training, plain inference) → pure float.
    """

    features: int
    kernel: int = 1
    strides: int = 1
    padding: str | Sequence[tuple[int, int]] = "SAME"
    kernel_init: Callable = glorot_uniform
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel, self.kernel, cin, self.features),
            self.param_dtype,
        )
        strides = (self.strides, self.strides)
        pixels = int(x.shape[1]) * int(x.shape[2]) if x.ndim == 4 else None
        if quant.eligible(cin, self.features, pixels) and not self.is_initializing():
            if self.is_mutable_collection("quant"):
                amax = self.variable(
                    "quant", "in_absmax", lambda: jnp.zeros((), jnp.float32)
                )
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            elif self.has_variable("quant", "in_absmax"):
                amax = self.variable(
                    "quant", "in_absmax", lambda: jnp.zeros((), jnp.float32)
                )
                y = quant.int8_conv(
                    x, k, amax.value, strides=strides, padding=self.padding
                )
                out_dtype = self.dtype or jnp.promote_types(x.dtype, k.dtype)
                return y.astype(out_dtype)
        x, k = nn.dtypes.promote_dtype(x, k, dtype=self.dtype)
        dn = lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        return lax.conv_general_dilated(
            x, k, strides, self.padding, dimension_numbers=dn
        )


class BatchNorm(nn.Module):
    """Keras-compatible BatchNormalization wrapper.

    Keras semantics: ema = momentum * ema + (1 - momentum) * batch, eps
    default 1e-3 — identical to flax with the same momentum.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    scale: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=self.scale,
            use_bias=True,
            dtype=self.dtype,
            name="bn",
        )(x)


class ConvBNReLU(nn.Module):
    """Conv(k, no bias) → BN → ReLU (reference encoder 1×1 arm :812-821,
    pyramid-pooling conv :843-851, concat projection :864-873).

    ``l2=True`` marks the kernel for weight decay (module named ``conv_l2``).
    """

    features: int
    kernel: int = 1
    strides: int = 1
    l2: bool = True
    kernel_init: Callable = glorot_uniform
    bn_momentum: float = 0.99
    bn_scale: bool = True
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        name = "conv_l2" if self.l2 else "conv"
        x = QuantConv(
            self.features,
            kernel=self.kernel,
            strides=self.strides,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name=name,
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum, scale=self.bn_scale, dtype=self.dtype, name="bn"
        )(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class SeparableConv(nn.Module):
    """Keras ``SeparableConv2D``: depthwise(k, dilation) → pointwise 1×1.

    No bias, depth_multiplier=1 (reference :823-830). Both kernels use the
    given init (the reference passes TruncatedNormal to the whole
    SeparableConv2D).
    """

    features: int
    kernel: int = 3
    strides: int = 1
    dilation: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    kernel_init: Callable = glorot_uniform
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = DepthwiseConv(
            kernel=self.kernel,
            strides=self.strides,
            dilation=self.dilation,
            padding=self.padding,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = QuantConv(
            self.features,
            kernel=1,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        return x


class SplitSepConvBlock(nn.Module):
    """The encoder-middle 'conv' op with kernel > 1 (reference :823-840):

    SeparableConv2D(C, k, dilation=rate×mult, TruncatedNormal)+BN+ReLU →
    1×1 Conv(C, TruncatedNormal, l2)+BN+ReLU.
    """

    features: int
    kernel: int
    dilation: tuple[int, int]
    bn_momentum: float
    bn_scale: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv(
            self.features,
            kernel=self.kernel,
            dilation=self.dilation,
            kernel_init=truncated_normal_05,
            dtype=self.dtype,
            name="sepconv",
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum, scale=self.bn_scale, dtype=self.dtype, name="bn1"
        )(x, train)
        x = nn.relu(x)
        x = QuantConv(
            self.features,
            kernel=1,
            kernel_init=truncated_normal_05,
            dtype=self.dtype,
            name="conv_l2",
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum, scale=self.bn_scale, dtype=self.dtype, name="bn2"
        )(x, train)
        return nn.relu(x)


def avg_pool_valid(x, pool_size: int):
    """Keras ``AveragePooling2D(pool_size, padding='valid')`` with default
    strides=pool_size (reference :841-842)."""
    return nn.avg_pool(
        x, (pool_size, pool_size), strides=(pool_size, pool_size), padding="VALID"
    )


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)
