"""Pallas TPU kernel: fused bilinear-upsample (×s) + channel argmax.

Inference-tail fusion (SURVEY §7 step 8, BASELINE.json north star "fused
resize kernels"): the decoder ends with bilinear ×output_stride upsample →
softmax → (consumer) argmax for segment/test (reference semantic_
segmentation.py:904-909, :1169-1181, :1224-1227).  Since softmax is
monotone per pixel, ``argmax(softmax(up(x))) == argmax(up(x))`` — this
kernel computes class labels straight from the low-resolution logits and
NEVER materializes the (B, H·s, W·s, C) tensor in HBM: output is
(B, H·s, W·s) int32, a C× cut in decoder-tail HBM write traffic.

TPU mapping:
- An integer scale s has exactly s interpolation *phases* per axis with
  compile-time weights — ``out[q·s+p] = (1−w_p)·in[q+δ_p] +
  w_p·in[q+δ_p+1]`` — so the upsample is s² whole-array shift-and-blend
  passes on the VPU (no gathers).
- Channel-first (c, h, w) layout: spatial dims land on the (sublane, lane)
  vector tiles with no padding waste (channel-minor would pad 21 → 128
  lanes); argmax over channels is a c-step elementwise select chain.
- The input is edge-padded by one row outside the kernel and kept in HBM
  (``pl.ANY``); each grid step DMAs its overlapping (c, Th+2, w) halo
  slab into VMEM scratch (halo slabs are not expressible as disjoint
  BlockSpec blocks), so VMEM holds only one row-tile regardless of h.
- Output is phase-planar (s, s, Th, w) per tile; the caller interleaves
  with one cheap int32 transpose+reshape.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_weights(s: int):
    """(delta, w1) per phase p: src = q + (p+0.5)/s − 0.5 = q + δ + w1."""
    out = []
    for p in range(s):
        off = (p + 0.5) / s - 0.5
        d = math.floor(off)
        out.append((d, off - d))
    return out


def _shift_w(x, d: int):
    """Edge-clamped shift by d ∈ {−1, 0, +1} along the last (w) axis."""
    if d == 0:
        return x
    if d == 1:
        return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)


def _kernel(in_hbm, out_ref, scratch, sem, *, s: int, c: int, th: int, w: int):
    b = pl.program_id(0)
    r = pl.program_id(1)

    copy = pltpu.make_async_copy(
        in_hbm.at[b, :, pl.ds(r * th, th + 8), :], scratch, sem
    )
    copy.start()
    copy.wait()

    phases = _phase_weights(s)
    for pr, (dr, wr) in enumerate(phases):
        # local slab rows [1, th+1) are this tile's rows; halo at 0 / th+1.
        r0 = scratch[:, 1 + dr : 1 + dr + th, :]          # (c, th, w)
        r1 = scratch[:, 2 + dr : 2 + dr + th, :]
        rows = r0 * (1.0 - wr) + r1 * wr
        for pc, (dc, wc) in enumerate(phases):
            n0 = _shift_w(rows, dc)
            n1 = _shift_w(rows, dc + 1)
            blended = n0 * (1.0 - wc) + n1 * wc           # (c, th, w)
            # first-max argmax over channels as a select chain.
            best = blended[0]
            idx = jnp.zeros(best.shape, jnp.int32)
            for ch in range(1, c):
                take = blended[ch] > best
                best = jnp.where(take, blended[ch], best)
                idx = jnp.where(take, jnp.int32(ch), idx)
            out_ref[0, pr, pc, :, :] = idx


@functools.partial(jax.jit, static_argnames=("scale",))
def upsample_argmax(logits: jax.Array, scale: int) -> jax.Array:
    """logits (B, h, w, C) float → labels (B, h·scale, w·scale) int32.

    Matches ``argmax(tf_resize_images(logits, s, s), -1)``.
    """
    B, h, w, c = logits.shape
    s = int(scale)
    if s == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # channel-first + edge replication: 1 halo row on top, 7 on the bottom
    # so every DMA slab is (th+8) rows — sublane-tiling (8) aligned; width
    # edge-padded to the 128-lane tile (edge mode keeps the clamp
    # semantics of the +1 column shift at the true right edge).
    wp = max(128, w)
    x = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 7), (0, wp - w)), mode="edge")

    th = h
    while th > 32 and h % (th // 2) == 0 and th % 2 == 0:
        th //= 2  # row tile ≤ 32 keeps the VMEM working set small
    n_tiles = h // th

    out = pl.pallas_call(
        functools.partial(_kernel, s=s, c=c, th=th, w=wp),
        out_shape=jax.ShapeDtypeStruct((B, s, s, h, wp), jnp.int32),
        grid=(B, n_tiles),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, s, s, th, wp), lambda b, r: (b, 0, 0, r, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, th + 8, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    # interleave: (B, pr, pc, h, wp) → (B, h, pr, w, pc) → (B, h·s, w·s)
    return out.transpose(0, 3, 1, 4, 2)[:, :, :, :w, :].reshape(B, h * s, w * s)


def upsample_argmax_reference(logits: jax.Array, scale: int) -> jax.Array:
    """jnp reference implementation (resize + argmax) for testing."""
    from ..ops.resize import tf_resize_images

    up = tf_resize_images(logits, scale, scale)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)
