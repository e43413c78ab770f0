"""Tap-major 3×3 convolution for tiny output-channel counts.

The decoder's classifier conv (3×3, 304 → num_classes=21, reference
semantic_segmentation.py:893-897) dominates the train step: at 512² with
refinement it is ~600 GFLOP per batch-8 forward, and its N=21 output
dimension occupies 21/128 of the MXU's systolic columns — an ~6× padding
loss for any direct lowering.

Restructure with identical math: a K×K conv is K² shifted 1×1 convs.
Stack all taps into ONE matmul with N = K²·Cout (= 189 for 3×3×21 → 74%
column utilization instead of 16%), then sum the 9 zero-padded shifted
slices (cheap VPU adds):

    out[h, w] = Σ_{a,b} x[h+a−1, w+b−1] @ K[a, b]          (SAME, zero pad)
              = Σ_{a,b} shift(x @ K[a, b], a−1, b−1)

Pure jnp — autodiff works through it, no custom VJP; float summation order
differs from the direct conv (tolerance ~1e-5 on logits).

The module keeps the exact param name/shape of ``nn.Conv`` (``kernel``
(3, 3, Cin, Cout)) so checkpoints and the Keras weight converter are
layout-compatible.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from ..models.blocks import glorot_uniform


def tap_major_conv3x3_same(x, kernel):
    """x (B, H, W, Cin), kernel (3, 3, Cin, Cout) → (B, H, W, Cout),
    zero-padded SAME, numerically ≡ lax.conv with SAME padding."""
    B, H, W, cin = x.shape
    cout = kernel.shape[-1]
    # (Cin, 9·Cout), tap order (a, b) row-major.
    w = kernel.transpose(2, 0, 1, 3).reshape(cin, 9 * cout)
    y = jnp.einsum("bhwc,cn->bhwn", x, w)  # the one big matmul
    y = y.reshape(B, H, W, 9, cout)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    for a in range(3):
        for b in range(3):
            tap = yp[:, a : a + H, b : b + W, 3 * a + b, :]
            out = tap if out is None else out + tap
    return out


class TapMajorConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding='SAME',
    use_bias=False)`` specialized for small ``features``."""

    features: int
    kernel_init: Callable = glorot_uniform
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        return tap_major_conv3x3_same(x.astype(dtype), kernel.astype(dtype))
