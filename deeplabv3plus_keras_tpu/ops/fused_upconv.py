"""Fused bilinear-upsample(×f) + 3×3 SAME conv.

The decoder's hot tail is ``conv3×3(resize_×f(x))`` (reference
semantic_segmentation.py:941-950 upsample, :893-897 classifier conv).
Computed literally, the ×f bilinear upsample materializes a (B, f·n, f·n,
C) tensor — 537 MB bf16 for the encoder stream at the flagship shape —
that the conv immediately re-reads 9×.  Round-3 profiling: resize +
layout copies + concat ≈ 12 ms of the 52 ms bf16 train step.

Algebra: half-pixel bilinear ×f is a transposed convolution with the
17-tap (2f) triangle kernel T, so the composition collapses into ONE
transposed conv with the composed kernel

    K[u, v, c, o] = Σ_{dh,dw} W[dh, dw, c, o] · A[u, dh] · A[v, dw],
    A[u, d] = max(0, 1 − |m_max − u + d − 1 − f/2 + 0.5| / f),

size (2f+2)² — computed from W each call (≲20 MFLOP, trivial), applied
via ``lax.conv_general_dilated(lhs_dilation=f)``.  The upsampled tensor
never exists.

Boundaries: jax.image.resize clamps source taps at the edges, which
breaks pure convolution structure on the outer f/2+1 output rows/cols;
those strips are recomputed EXACTLY through the plain resize→conv path
on 3-source-row/col slabs and patched in, so the whole result equals
``conv3×3(tf_resize_images(x, f, f))`` to fp rounding (tests/
test_fused_upconv.py, incl. gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .resize import tf_resize_images


def _compose_matrix(f: int) -> np.ndarray:
    """A[u, d]: weight of conv tap d ∈ {0,1,2} at transposed-kernel
    position u ∈ [0, 2f+2) (flipped for conv_general_dilated)."""
    L = 2 * f + 2
    m_max = 3 * f // 2
    A = np.zeros((L, 3), np.float32)
    for u in range(L):
        for d in range(3):
            z = m_max - u + d - 1
            A[u, d] = max(0.0, 1.0 - abs(z - f / 2 + 0.5) / f)
    return A


def _plain(x, w, f):
    up = tf_resize_images(x, f, f)
    return jax.lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@functools.partial(jax.jit, static_argnames=("f",))
def upsample_conv3(x, w, f: int):
    """``conv3×3_SAME(bilinear_upsample_×f(x), w)`` without materializing
    the upsampled tensor.

    x: (B, H, W, C); w: (3, 3, C, O); f: even integer ≥ 2.
    Result: (B, f·H, f·W, O), equal to the two-step computation.
    """
    n_h, n_w = x.shape[1], x.shape[2]
    if f < 2 or f % 2 or min(n_h, n_w) < 3:
        return _plain(x, w, f)  # tiny inputs: strips would overlap

    A = jnp.asarray(_compose_matrix(f), w.dtype)
    k = jnp.einsum("hwco,uh,vw->uvco", w, A, A)
    pad = 3 * f // 2
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(f, f),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # exact border strips (resize edge-clamp region + 1 conv row/col),
    # assembled by concatenation — slice+concat instead of scatter keeps
    # the graph TFLite-quantizable (stablehlo.scatter has no TFLite
    # legalization) at identical numerics; the horizontal strips go last
    # so the corners take the left/right values
    P = f // 2 + 1
    top = _plain(x[:, :3], w, f)[:, :P]
    bot = _plain(x[:, -3:], w, f)[:, -P:]
    left = _plain(x[:, :, :3], w, f)[:, :, :P]
    right = _plain(x[:, :, -3:], w, f)[:, :, -P:]
    y = jnp.concatenate([top, y[:, P:-P], bot], axis=1)
    y = jnp.concatenate([left, y[:, :, P:-P], right], axis=2)
    return y
