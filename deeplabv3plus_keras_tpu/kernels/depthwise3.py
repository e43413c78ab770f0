"""Pallas TPU kernel: depthwise 3×3 convolution (stride 1, SAME) + VJP.

MobileNetV2's signature op (reference backbone via keras.applications
MobileNetV2; our models/backbones/mobilenetv2.py InvertedResidual).  On
TPU, XLA executes *fp32* convolutions as a ~3-pass bf16 MXU
decomposition; for a depthwise conv — which has almost no FLOPs — that
decomposition is pure overhead: identity-ablation shows a ~10 ms delta
across all depthwise stages of the 85 ms fp32 flagship train step,
vs ~0.5 ms in a bf16 step.  NOTE (round 5): the ablation's identity
preserves the op's tensor TRAFFIC, so these deltas bound the
removable arithmetic/decomposition share only — the unavoidable
HBM-traffic cost of the stages (~several ms either dtype) is paid by
any lowering and is NOT included; see PERFORMANCE.md "Per-site bf16
depthwise accounting" for the full reconciliation.  XLA
reformulations (nine-shifted-FMA, NCHW) do not fix the fp32 case.

The stencil is a natural VPU op: nine shift-and-FMA passes.  TPU mapping:

- Layout (B, H, C, W): C rides the 8-sublane axis (every MobileNetV2
  depthwise width — 32/96/144/192/384/576 — is a multiple of 8, zero
  padding waste) and W rides the 128-lane axis (spatial widths
  32/64/128/256 are lane-aligned).  H-shifts are leading-dim slices of
  the DMA slab; W-shifts are two-piece lane concatenations with a zero
  edge column (= the conv's SAME zero padding).
- The (H+2)-row zero-padded input stays in HBM (``pl.ANY``); each grid
  step DMAs its overlapping (th+2, cb, W) halo slab into VMEM scratch
  (overlapping slabs are not expressible as disjoint BlockSpec blocks —
  same pattern as kernels/upsample_argmax.py).
- Grid (B, H/th, C/cb) with (th, cb) chosen so slab+output fit in a few
  MB of VMEM; taps are applied in true input precision (fp32 stays
  fp32 — *more* accurate than XLA's bf16×3 conv decomposition).

Backward (custom_vjp):
- dL/dx = SAME-correlation of the cotangent with the 180°-flipped taps —
  the SAME forward kernel with the 9-vector tap table reversed.
- dL/dk[t, c] = Σ_{b,h,w} x_pad[shifted t] · g — computed in the same
  pass as dL/dx by a second kernel output that accumulates (9, cb)
  partial sums across the sequential (b, r) grid steps (TPU grids are
  sequential, so revisiting an output block is a legal accumulation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_w(x, d: int):
    """Zero-edge shift by d ∈ {−1, 0, +1} along the last (lane/W) axis.

    Result[w] = x[w + d] with zeros shifted in at the true image edge
    (the conv's SAME zero padding)."""
    if d == 0:
        return x
    z = jnp.zeros_like(x[..., :1])
    if d == 1:
        return jnp.concatenate([x[..., 1:], z], axis=-1)
    return jnp.concatenate([z, x[..., :-1]], axis=-1)


def _fwd_kernel(x_hbm, k_ref, out_ref, scratch, sem, *, th: int, cb: int):
    cblk = pl.program_id(0)
    b = pl.program_id(1)
    r = pl.program_id(2)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * th, th + 2), pl.ds(cblk * cb, cb), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    acc = None
    for dy in range(3):
        rows = scratch[dy : dy + th]  # (th, cb, W)
        for dx in range(3):
            # k_ref is (9, cb, 1): cb already on sublanes, so this broadcast
            # over the W lanes needs no relayout.
            kv = k_ref[dy * 3 + dx]
            term = _shift_w(rows, dx - 1) * kv
            acc = term if acc is None else acc + term
    out_ref[0] = acc


def _tiles(H: int, C: int, W: int, itemsize: int):
    """(th, cb) with th·cb·W·itemsize (+ halo) in the low-MB range."""
    cb = C
    while cb > 192 and cb % 2 == 0:
        cb //= 2
    th = H
    # slab + out + dx/dk scratch head-room: keep slab ≤ ~2 MB
    while th > 8 and (th + 2) * cb * W * itemsize > 2 * 1024 * 1024:
        th //= 2
    while H % th:
        th //= 2
    return max(th, 1), cb


def _dw_fwd_padded(xp: jax.Array, k9: jax.Array, interpret: bool):
    """Core stencil on the (B, H+2, C, W) zero-padded input."""
    B, Hp, C, W = xp.shape
    H = Hp - 2
    th, cb = _tiles(H, C, W, xp.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, cb=cb),
        out_shape=jax.ShapeDtypeStruct((B, H, C, W), xp.dtype),
        grid=(C // cb, B, H // th),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cb, 1), lambda c, b, r: (0, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, cb, W), lambda c, b, r: (b, r, c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, cb, W), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, k9)


def _bwd_kernel(
    x_hbm, g_hbm, k_ref, dx_ref, dk_ref, xs, gs, sem, *, th: int, cb: int
):
    # C-tile is the OUTERMOST grid dim so every (b, r) visit to this
    # c-block's dk accumulator is consecutive in the sequential grid —
    # the condition under which Pallas keeps a revisited output block
    # resident instead of spilling it between visits.
    cblk = pl.program_id(0)
    b = pl.program_id(1)
    r = pl.program_id(2)

    cx = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * th, th + 2), pl.ds(cblk * cb, cb), :], xs, sem
    )
    cx.start()
    cg = pltpu.make_async_copy(
        g_hbm.at[b, pl.ds(r * th, th + 2), pl.ds(cblk * cb, cb), :], gs, sem
    )
    cx.wait()
    cg.start()
    cg.wait()

    # dx: correlation of g with the flipped taps == forward stencil with
    # the 9-tap table reversed.
    acc = None
    for dy in range(3):
        rows = gs[dy : dy + th]
        for dx in range(3):
            kv = k_ref[8 - (dy * 3 + dx)]  # (cb, 1), no relayout
            term = _shift_w(rows, dx - 1) * kv
            acc = term if acc is None else acc + term
    dx_ref[0] = acc

    # dk: per-tap reduction of x_pad[shifted] · g over this tile,
    # accumulated across the sequential (b, r) grid.  The (0, 2) reduction
    # with keepdims leaves (cb, 1) — cb on sublanes, matching dk_ref's
    # (9, cb, 1) layout with no relayout.
    g_c = gs[1 : 1 + th]  # center rows = this tile's cotangent
    first = jnp.logical_and(b == 0, r == 0)
    for dy in range(3):
        x_rows = xs[dy : dy + th]
        for dx in range(3):
            t = dy * 3 + dx
            contrib = jnp.sum(
                _shift_w(x_rows, dx - 1) * g_c, axis=(0, 2), keepdims=True
            )[0]

            @pl.when(first)
            def _():
                dk_ref[t] = contrib

            @pl.when(jnp.logical_not(first))
            def _():
                dk_ref[t] = dk_ref[t] + contrib


def _dw_bwd_padded(xp: jax.Array, gp: jax.Array, k9: jax.Array, interpret: bool):
    B, Hp, C, W = xp.shape
    H = Hp - 2
    th, cb = _tiles(H, C, W, xp.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, cb=cb),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, C, W), xp.dtype),
            jax.ShapeDtypeStruct((9, C, 1), xp.dtype),
        ),
        grid=(C // cb, B, H // th),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cb, 1), lambda c, b, r: (0, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, cb, W), lambda c, b, r: (b, r, c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((9, cb, 1), lambda c, b, r: (0, c, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, cb, W), xp.dtype),
            pltpu.VMEM((th + 2, cb, W), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, gp, k9)


def _to_bhcw_padded(x_nhwc: jax.Array) -> jax.Array:
    """(B, H, W, C) → zero-H-padded (B, H+2, C, W)."""
    xt = jnp.transpose(x_nhwc, (0, 1, 3, 2))
    return jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))


# ---------------------------------------------------------------------------
# NHWC-native variant: C on lanes, W on sublanes — no transposes at all.
#
# The (B, H, C, W) layout above has perfect lane alignment (spatial W is a
# multiple of 128 at every flagship stage) but pays a full transpose on entry
# and exit — two extra HBM round trips on a memory-bound op.  Here the model's
# native NHWC goes straight in: W-shifts become sublane shifts, per-channel
# taps broadcast from a (1, C) lane vector, and ragged C (144, 576, …) only
# pads VMEM lanes — HBM traffic moves actual bytes either way.  Which wins is
# an empirical question (DLV3_DW_LAYOUT, tools/depthwise_bench.py).
# ---------------------------------------------------------------------------


def _shift_sub(x, d: int):
    """Zero-edge shift by any static d along axis -2 (sublane/W axis).

    Result[w] = x[w + d] with zeros shifted in at the true image edge
    (the conv's SAME zero padding)."""
    if d == 0:
        return x
    z = jnp.zeros_like(x[..., : abs(d), :])
    if d > 0:
        return jnp.concatenate([x[..., d:, :], z], axis=-2)
    return jnp.concatenate([z, x[..., :d, :]], axis=-2)


def _pipeline_coords():
    """(step, parity, not_last, next-b, next-r) for a (B, NR) grid.

    The grid is sequential on TPU, so issuing the NEXT step's halo-slab DMA
    into the other buffer slot before waiting on this step's overlaps the
    input DMA with compute (depth-1 prefetch; guide 'Double Buffering').
    Slot indices stay static by branching on the step parity."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    NR = pl.num_programs(1)
    step = b * NR + r
    parity = jax.lax.rem(step, 2)
    not_last = step + 1 < pl.num_programs(0) * NR
    wrap = r + 1 == NR
    rn = jax.lax.select(wrap, 0, r + 1)
    bn = jax.lax.select(wrap, b + 1, b)
    return b, r, step, parity, not_last, bn, rn


def _fwd_kernel_nhwc(x_hbm, k_ref, out_ref, scratch, sem,
                     *, th: int, k: int, dh: int, dw: int):
    halo = (k - 1) * dh
    b, r, step, parity, not_last, bn, rn = _pipeline_coords()

    def dma(slot: int, bb, rr):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(rr * th, th + halo), :, :],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, b, r).start()

    def process(slot: int):
        @pl.when(not_last)
        def _():
            dma(1 - slot, bn, rn).start()

        dma(slot, b, r).wait()
        acc = None
        for iy in range(k):
            rows = scratch[slot, iy * dh : iy * dh + th]  # (th, W, C)
            for ix in range(k):
                kv = k_ref[iy * k + ix]  # (1, C): lane vector, no relayout
                term = _shift_sub(rows, (ix - k // 2) * dw) * kv
                acc = term if acc is None else acc + term
        out_ref[0] = acc

    @pl.when(parity == 0)
    def _():
        process(0)

    @pl.when(parity == 1)
    def _():
        process(1)


def _tiles_nhwc(H: int, W: int, C: int, itemsize: int, halo: int) -> int:
    # ≤1 MB per slab: double-buffered inputs keep 2 slabs (+2 output
    # buffers) resident, so stay well inside VMEM.
    th = H
    while th > 8 and (th + halo) * W * C * itemsize > 1024 * 1024:
        th //= 2
    while H % th:
        th //= 2
    return max(th, 1)


def _dw_fwd_nhwc(xp: jax.Array, k9: jax.Array, k: int, dil, interpret: bool):
    """Core stencil on the (B, H+halo, W, C) zero-H-padded input."""
    dh, dw = dil
    halo = (k - 1) * dh
    B, Hp, W, C = xp.shape
    H = Hp - halo
    th = _tiles_nhwc(H, W, C, xp.dtype.itemsize, halo)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_nhwc, th=th, k=k, dh=dh, dw=dw),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), xp.dtype),
        grid=(B, H // th),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k * k, 1, C), lambda b, r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, C), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + halo, W, C), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, k9)


def _bwd_kernel_nhwc(x_hbm, g_hbm, k_ref, dx_ref, dk_ref, xs, gs, sx, sg,
                     *, th: int, k: int, dh: int, dw: int):
    halo = (k - 1) * dh
    b, r, step, parity, not_last, bn, rn = _pipeline_coords()

    def dmas(slot: int, bb, rr):
        return (
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(rr * th, th + halo), :, :],
                xs.at[slot],
                sx.at[slot],
            ),
            pltpu.make_async_copy(
                g_hbm.at[bb, pl.ds(rr * th, th + halo), :, :],
                gs.at[slot],
                sg.at[slot],
            ),
        )

    @pl.when(step == 0)
    def _():
        for c in dmas(0, b, r):
            c.start()

    def process(slot: int):
        @pl.when(not_last)
        def _():
            for c in dmas(1 - slot, bn, rn):
                c.start()

        for c in dmas(slot, b, r):
            c.wait()

        # dx: correlation of g with the flipped taps == forward stencil
        # with the tap table reversed (same dilation; symmetric pad).
        acc = None
        for iy in range(k):
            rows = gs[slot, iy * dh : iy * dh + th]
            for ix in range(k):
                kv = k_ref[k * k - 1 - (iy * k + ix)]  # (1, C)
                term = _shift_sub(rows, (ix - k // 2) * dw) * kv
                acc = term if acc is None else acc + term
        dx_ref[0] = acc

        # dk: (0, 1) reduction leaves a (1, C) lane vector — accumulated into
        # the single (k², 1, C) block, which every sequential grid step
        # revisits.
        g_c = gs[slot, halo // 2 : halo // 2 + th]
        first = jnp.logical_and(b == 0, r == 0)
        for iy in range(k):
            x_rows = xs[slot, iy * dh : iy * dh + th]
            for ix in range(k):
                t = iy * k + ix
                contrib = jnp.sum(
                    _shift_sub(x_rows, (ix - k // 2) * dw) * g_c,
                    axis=(0, 1),
                    keepdims=True,
                )[0]

                @pl.when(first)
                def _():
                    dk_ref[t] = contrib

                @pl.when(jnp.logical_not(first))
                def _():
                    dk_ref[t] = dk_ref[t] + contrib

    @pl.when(parity == 0)
    def _():
        process(0)

    @pl.when(parity == 1)
    def _():
        process(1)


def _dw_bwd_nhwc(xp: jax.Array, gp: jax.Array, k9: jax.Array, k: int, dil,
                 interpret: bool):
    dh, dw = dil
    halo = (k - 1) * dh
    B, Hp, W, C = xp.shape
    H = Hp - halo
    th = _tiles_nhwc(H, W, C, xp.dtype.itemsize, halo)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_nhwc, th=th, k=k, dh=dh, dw=dw),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), xp.dtype),
            jax.ShapeDtypeStruct((k * k, 1, C), xp.dtype),
        ),
        grid=(B, H // th),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k * k, 1, C), lambda b, r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, W, C), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k * k, 1, C), lambda b, r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + halo, W, C), xp.dtype),
            pltpu.VMEM((2, th + halo, W, C), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, gp, k9)


def _pad_h(x_nhwc: jax.Array, ph: int = 1) -> jax.Array:
    return jnp.pad(x_nhwc, ((0, 0), (ph, ph), (0, 0), (0, 0)))


def _layout() -> str:
    """DLV3_DW_LAYOUT: 'nhwc' (default — transpose-free) or 'bhcw'."""
    return os.environ.get("DLV3_DW_LAYOUT", "nhwc")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_s1(x: jax.Array, kernel: jax.Array, dil) -> jax.Array:
    """Depthwise k×k (k odd), stride 1, dilation ``dil``, SAME, NHWC.

    x: (B, H, W, C); kernel: (k, k, 1, C) (the HWIO grouped-conv layout
    flax uses with ``feature_group_count=C``).  Matches
    ``lax.conv_general_dilated(..., rhs_dilation=dil)`` — in fp32 it
    is *more* accurate (true fp32 FMAs vs XLA's bf16×3 decomposition).
    """
    k = kernel.shape[0]
    C = kernel.shape[-1]
    if k == 3 and dil == (1, 1) and _layout() == "bhcw":
        k9 = kernel.reshape(9, C, 1).astype(x.dtype)
        out = _dw_fwd_padded(_to_bhcw_padded(x), k9, _interpret())
        return jnp.transpose(out, (0, 1, 3, 2))
    kt = kernel.reshape(k * k, 1, C).astype(x.dtype)
    return _dw_fwd_nhwc(
        _pad_h(x, (k // 2) * dil[0]), kt, k, dil, _interpret()
    )


def _vjp_fwd(x, kernel, dil):
    return _dw_s1(x, kernel, dil), (x, kernel)


def _vjp_bwd(dil, res, g):
    x, kernel = res
    k = kernel.shape[0]
    C = kernel.shape[-1]
    if k == 3 and dil == (1, 1) and _layout() == "bhcw":
        k9 = kernel.reshape(9, C, 1).astype(x.dtype)
        dx, dk9 = _dw_bwd_padded(
            _to_bhcw_padded(x),
            _to_bhcw_padded(g.astype(x.dtype)),
            k9,
            _interpret(),
        )
        dx = jnp.transpose(dx, (0, 1, 3, 2))
        return dx, dk9.reshape(kernel.shape).astype(kernel.dtype)
    ph = (k // 2) * dil[0]
    kt = kernel.reshape(k * k, 1, C).astype(x.dtype)
    dx, dkt = _dw_bwd_nhwc(
        _pad_h(x, ph), _pad_h(g.astype(x.dtype), ph), kt, k, dil, _interpret()
    )
    return dx, dkt.reshape(kernel.shape).astype(kernel.dtype)


_dw_s1.defvjp(_vjp_fwd, _vjp_bwd)


def depthwise_stencil(x: jax.Array, kernel: jax.Array, dilation=(1, 1)) -> jax.Array:
    """General stride-1 depthwise stencil (odd k, any dilation), NHWC."""
    return _dw_s1(x, kernel, (int(dilation[0]), int(dilation[1])))


def depthwise3x3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 3×3, stride 1, dilation 1 — the flagship fast path."""
    return _dw_s1(x, kernel, (1, 1))


def depthwise3x3_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """lax grouped-conv reference for testing."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


# ---------------------------------------------------------------------------
# Stride-2 variant via polyphase (parity-plane) decomposition.
#
# SAME stride-2 with odd k on even H/W pads lo=(k-2)//2 before and
# k-2-lo after per spatial dim, so out[i,j] = Σ_{dy,dx}
# x[2i+dy-lo, 2j+dx-lo]·k[dy,dx].  Split x into the four parity planes
# P_pq[i,j] = x[2i+p, 2j+q] (each (H/2, W/2)); tap d then reads plane
# parity (d-lo)%2 at offset (d-lo)//2 ∈ [omin_p, omax_p] — e.g. k=3
# (lo=0): E offsets {0,+1}, O {0}; k=5 (lo=1): E {0,+1}, O {−1,0,+1}.
# Planes are zero-padded by (−omin, omax) per axis (exactly the conv's
# asymmetric SAME padding), making every tap a static 2-D slice of a
# halo slab.  The split/merge interleaves are cheap XLA gathers outside
# the kernel; inside, everything is the same NHWC shift-and-FMA
# machinery as the stride-1 stencil.  Covers the remaining flagship
# depthwise sites (256²C96, 128²C144, 64²C192 at k=3) plus EfficientNet
# k5-s2 and NASNet k5/k7-s2 reduction stages.
# ---------------------------------------------------------------------------


def _s2_geometry(k: int):
    """Static tap geometry for the stride-2 polyphase stencil (odd k).

    Returns (span, taps, gpad, gtaps):
      span[p]  — omax_p − omin_p, the extra halo rows/cols of parity-p
                 planes (plane pads: top/left −omin_p, bottom/right omax_p);
      taps     — ((t, py, px, ry, rx), …): forward tap t reads plane
                 (py, px) slab at static offset (ry, rx);
      gpad     — (gt, gb): cotangent slab pad (top/left, bottom/right);
      gtaps[p] — ((t_or_d, gr), …) per output-plane parity p: backward
                 tap d reads the g slab at row offset gr = gt − odx.
    """
    lo = (k - 2) // 2
    par = [(d - lo) % 2 for d in range(k)]
    off = [(d - lo) // 2 for d in range(k)]
    omin = {p: min(off[d] for d in range(k) if par[d] == p) for p in (0, 1)}
    omax = {p: max(off[d] for d in range(k) if par[d] == p) for p in (0, 1)}
    span = (omax[0] - omin[0], omax[1] - omin[1])
    taps = tuple(
        (dy * k + dx, par[dy], par[dx],
         off[dy] - omin[par[dy]], off[dx] - omin[par[dx]])
        for dy in range(k)
        for dx in range(k)
    )
    # Backward: dx-plane parity p gets k[d]·g[m − odx] for taps d with
    # (d − lo − p) even, odx = (d − lo − p)//2.
    odxs = {
        p: {d: (d - lo - p) // 2 for d in range(k) if (d - lo - p) % 2 == 0}
        for p in (0, 1)
    }
    gt = max(o for m in odxs.values() for o in m.values())
    gb = max(-o for m in odxs.values() for o in m.values())
    gtaps = {
        p: tuple((d, gt - o) for d, o in odxs[p].items()) for p in (0, 1)
    }
    return span, taps, (gt, gb), (gtaps[0], gtaps[1])


def _split_parities(x: jax.Array):
    """(B, H, W, C) → (ee, eo, oe, oo), each (B, H/2, W/2, C)."""
    B, H, W, C = x.shape
    v = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return v[:, :, 0, :, 0], v[:, :, 0, :, 1], v[:, :, 1, :, 0], v[:, :, 1, :, 1]


def _merge_parities(ee, eo, oe, oo) -> jax.Array:
    """Inverse of _split_parities."""
    B, Ho, Wh, C = ee.shape
    top = jnp.stack([ee, eo], axis=3)  # (B, Ho, Wh, 2, C)
    bot = jnp.stack([oe, oo], axis=3)
    v = jnp.stack([top, bot], axis=2)  # (B, Ho, 2, Wh, 2, C)
    return v.reshape(B, 2 * Ho, 2 * Wh, C)


def _tiles_s2(Ho: int, Wh: int, C: int, itemsize: int) -> int:
    """Row-tile: the double-buffered bwd kernel holds ~14 th·Wh·C
    slabs/blocks in VMEM — keep each in the few-hundred-KB range."""
    th = Ho
    while th > 4 and th * Wh * C * itemsize > 256 * 1024:
        th //= 2
    while Ho % th:
        th //= 2
    return max(th, 1)


def _fwd_kernel_s2(ee_h, eo_h, oe_h, oo_h, k_ref, out_ref,
                   ees, eos, oes, oos, s0, s1, s2, s3,
                   *, th: int, wh: int, span, taps):
    b, r, step, parity, not_last, bn, rn = _pipeline_coords()

    def dmas(slot: int, bb, rr):
        refs = (ees, eos, oes, oos)
        sems = (s0, s1, s2, s3)
        spans = (
            (span[0], span[0]), (span[0], span[1]),
            (span[1], span[0]), (span[1], span[1]),
        )
        return tuple(
            pltpu.make_async_copy(
                h.at[bb, pl.ds(rr * th, th + sy), :, :], ref.at[slot], sem.at[slot]
            )
            for h, ref, sem, (sy, _) in zip(
                (ee_h, eo_h, oe_h, oo_h), refs, sems, spans
            )
        )

    @pl.when(step == 0)
    def _():
        for c in dmas(0, b, r):
            c.start()

    def process(slot: int):
        @pl.when(not_last)
        def _():
            for c in dmas(1 - slot, bn, rn):
                c.start()

        for c in dmas(slot, b, r):
            c.wait()

        planes = {
            (0, 0): ees.at[slot], (0, 1): eos.at[slot],
            (1, 0): oes.at[slot], (1, 1): oos.at[slot],
        }
        acc = None
        for t, py, px, ry, rx in taps:
            term = k_ref[t] * planes[(py, px)][ry : ry + th, rx : rx + wh]
            acc = term if acc is None else acc + term
        out_ref[0] = acc

    @pl.when(parity == 0)
    def _():
        process(0)

    @pl.when(parity == 1)
    def _():
        process(1)


def _dw_fwd_s2(eep, eop, oep, oop, k9, k: int, interpret: bool):
    span, taps, _, _ = _s2_geometry(k)
    B, Hop, Whp, C = eep.shape  # (B, Ho+span0, Wh+span0, C)
    Ho, Wh = Hop - span[0], Whp - span[0]
    th = _tiles_s2(Ho, Wh, C, eep.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_s2, th=th, wh=Wh, span=span, taps=taps),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wh, C), eep.dtype),
        grid=(B, Ho // th),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k * k, 1, C), lambda b, r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, Wh, C), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + span[0], Wh + span[0], C), eep.dtype),
            pltpu.VMEM((2, th + span[0], Wh + span[1], C), eep.dtype),
            pltpu.VMEM((2, th + span[1], Wh + span[0], C), eep.dtype),
            pltpu.VMEM((2, th + span[1], Wh + span[1], C), eep.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(eep, eop, oep, oop, k9)


def _bwd_kernel_s2(ee_h, eo_h, oe_h, oo_h, gp_h, k_ref,
                   dee_ref, deo_ref, doe_ref, doo_ref, dk_ref,
                   ees, eos, oes, oos, gps, s0, s1, s2, s3, s4,
                   *, th: int, wh: int, k: int, span, taps, gpad, gtaps):
    gt, gb = gpad
    gspan = gt + gb
    b, r, step, parity, not_last, bn, rn = _pipeline_coords()

    def dmas(slot: int, bb, rr):
        srcs = (ee_h, eo_h, oe_h, oo_h, gp_h)
        refs = (ees, eos, oes, oos, gps)
        sems = (s0, s1, s2, s3, s4)
        rows = (span[0], span[0], span[1], span[1], gspan)
        return tuple(
            pltpu.make_async_copy(
                h.at[bb, pl.ds(rr * th, th + sy), :, :], ref.at[slot], sem.at[slot]
            )
            for h, ref, sem, sy in zip(srcs, refs, sems, rows)
        )

    @pl.when(step == 0)
    def _():
        for c in dmas(0, b, r):
            c.start()

    def process(slot: int):
        @pl.when(not_last)
        def _():
            for c in dmas(1 - slot, bn, rn):
                c.start()

        for c in dmas(slot, b, r):
            c.wait()

        planes = {
            (0, 0): ees.at[slot], (0, 1): eos.at[slot],
            (1, 0): oes.at[slot], (1, 1): oos.at[slot],
        }
        gp = gps.at[slot]

        # dx parity planes: dx_pq[m,n] = Σ k[dy,dx]·g[m−odx(dy,p), n−odx(dx,q)],
        # read as static slices of the (gt, gb)-padded cotangent slab.
        outs = {(0, 0): dee_ref, (0, 1): deo_ref, (1, 0): doe_ref, (1, 1): doo_ref}
        for p in (0, 1):
            for q in (0, 1):
                acc = None
                for dy, gry in gtaps[p]:
                    for dx, grx in gtaps[q]:
                        term = k_ref[dy * k + dx] * gp[
                            gry : gry + th, grx : grx + wh
                        ]
                        acc = term if acc is None else acc + term
                outs[(p, q)][0] = acc

        # dk: per-tap plane·g reductions (same plane reads as the forward),
        # accumulated across the sequential grid.
        g_c = gp[gt : gt + th, gt : gt + wh]
        first = jnp.logical_and(b == 0, r == 0)
        for t, py, px, ry, rx in taps:
            plane = planes[(py, px)][ry : ry + th, rx : rx + wh]
            contrib = jnp.sum(plane * g_c, axis=(0, 1), keepdims=True)[0]

            @pl.when(first)
            def _():
                dk_ref[t] = contrib

            @pl.when(jnp.logical_not(first))
            def _():
                dk_ref[t] = dk_ref[t] + contrib

    @pl.when(parity == 0)
    def _():
        process(0)

    @pl.when(parity == 1)
    def _():
        process(1)


def _dw_bwd_s2(eep, eop, oep, oop, gp, k9, k: int, interpret: bool):
    span, taps, gpad, gtaps = _s2_geometry(k)
    B, Hop, Whp, C = eep.shape
    Ho, Wh = Hop - span[0], Whp - span[0]
    th = _tiles_s2(Ho, Wh, C, eep.dtype.itemsize)
    plane = jax.ShapeDtypeStruct((B, Ho, Wh, C), eep.dtype)
    blk = pl.BlockSpec(
        (1, th, Wh, C), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    gspan = gpad[0] + gpad[1]
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_s2, th=th, wh=Wh, k=k, span=span, taps=taps,
            gpad=gpad, gtaps=gtaps,
        ),
        out_shape=(plane, plane, plane, plane,
                   jax.ShapeDtypeStruct((k * k, 1, C), eep.dtype)),
        grid=(B, Ho // th),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (k * k, 1, C), lambda b, r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            blk, blk, blk, blk,
            pl.BlockSpec(
                (k * k, 1, C), lambda b, r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + span[0], Wh + span[0], C), eep.dtype),
            pltpu.VMEM((2, th + span[0], Wh + span[1], C), eep.dtype),
            pltpu.VMEM((2, th + span[1], Wh + span[0], C), eep.dtype),
            pltpu.VMEM((2, th + span[1], Wh + span[1], C), eep.dtype),
            pltpu.VMEM((2, th + gspan, Wh + gspan, C), eep.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(eep, eop, oep, oop, gp, k9)


def _padded_planes(x: jax.Array, k: int):
    """Parity planes zero-padded by (−omin, omax) per axis (= the conv's
    asymmetric SAME padding in plane coordinates)."""
    span, _, _, _ = _s2_geometry(k)
    # omin = span - omax; for all supported k, omax = 1 and omin = 1 - span
    # per parity — derive pads directly from the offset sets.
    lo = (k - 2) // 2
    par = [(d - lo) % 2 for d in range(k)]
    off = [(d - lo) // 2 for d in range(k)]
    pads = {}
    for p in (0, 1):
        os_ = [off[d] for d in range(k) if par[d] == p]
        pads[p] = (-min(os_), max(os_))
    ee, eo, oe, oo = _split_parities(x)
    out = []
    for plane, (py, px) in zip(
        (ee, eo, oe, oo), ((0, 0), (0, 1), (1, 0), (1, 1))
    ):
        out.append(
            jnp.pad(plane, ((0, 0), pads[py], pads[px], (0, 0)))
        )
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_s2(x: jax.Array, kernel: jax.Array, k: int) -> jax.Array:
    """Depthwise k×k (k odd), stride 2, SAME (even H/W), NHWC — polyphase."""
    kt = kernel.reshape(k * k, 1, kernel.shape[-1]).astype(x.dtype)
    eep, eop, oep, oop = _padded_planes(x, k)
    return _dw_fwd_s2(eep, eop, oep, oop, kt, k, _interpret())


def _vjp_fwd_s2(x, kernel, k):
    return _dw_s2(x, kernel, k), (x, kernel)


def _vjp_bwd_s2(k, res, g):
    x, kernel = res
    kt = kernel.reshape(k * k, 1, kernel.shape[-1]).astype(x.dtype)
    eep, eop, oep, oop = _padded_planes(x, k)
    _, _, gpad, _ = _s2_geometry(k)
    gp = jnp.pad(
        g.astype(x.dtype),
        ((0, 0), (gpad[0], gpad[1]), (gpad[0], gpad[1]), (0, 0)),
    )
    dee, deo, doe, doo, dkt = _dw_bwd_s2(eep, eop, oep, oop, gp, kt, k, _interpret())
    dx = _merge_parities(dee, deo, doe, doo)
    return dx, dkt.reshape(kernel.shape).astype(kernel.dtype)


_dw_s2.defvjp(_vjp_fwd_s2, _vjp_bwd_s2)


def depthwise_stencil_s2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """General stride-2 polyphase stencil (odd k from kernel shape)."""
    return _dw_s2(x, kernel, int(kernel.shape[0]))


def depthwise3x3_s2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 3×3, stride 2 — the flagship fast path."""
    return _dw_s2(x, kernel, 3)


def depthwise3x3_s2_reference(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """lax grouped-conv stride-2 reference for testing."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (2, 2),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


# ---------------------------------------------------------------------------
# Dispatcher: route eligible depthwise convs to the Pallas stencil.
# ---------------------------------------------------------------------------

# The Pallas path is a plain custom call that GSPMD cannot partition: a 3×3
# stencil under spatial sharding needs halo exchange that only XLA's conv
# lowering inserts automatically.  api.py flips this off whenever the active
# mesh has more than one device; single-chip (the common and benchmarked
# case) keeps the kernel.
_single_device_mesh: bool = True


def set_single_device_mesh(flag: bool) -> None:
    """Called by the runtime when the device mesh is (non-)trivial."""
    global _single_device_mesh
    _single_device_mesh = bool(flag)


# Lazily probed on the first auto dispatch on TPU: compile + run the
# stencils and their VJPs on tiny shapes so a Mosaic rejection on some
# toolchain degrades to the lax path instead of crashing model compile.
_viable: bool | None = None


def _probe_viable() -> bool:
    """Compile AND numerically check the stencils against lax on the live
    backend; disable dispatch on any failure.  Catches both Mosaic
    rejections and backend-specific miscompiles (e.g. if the sequential-
    grid dk accumulation assumption ever broke, gradients would silently
    corrupt training — so the probe compares values, not just liveness).

    The probe runs in a WORKER THREAD: dispatch happens at trace time, so
    the first call arrives inside an outer jit trace, where every jax op —
    concrete inputs or not — joins the ambient trace and the probe's
    ``float()`` value fetches raise ConcretizationTypeError (measured: the
    except-clause would then silently disable the stencils everywhere).
    JAX trace state is thread-local; a fresh thread evaluates eagerly."""
    global _viable
    if _viable is None:
        import threading

        box = {}

        def _work():
            try:
                _run_probe()
                box["ok"] = True
            except Exception as e:  # pragma: no cover - backend-specific
                box["err"] = e

        t = threading.Thread(target=_work, name="dlv3-depthwise-probe")
        t.start()
        t.join()
        if box.get("ok"):
            _viable = True
        else:
            import warnings

            warnings.warn(
                f"Pallas depthwise stencil failed its probe (compile or "
                f"numerics); falling back to lax convs: {box.get('err')!r}"
            )
            _viable = False
    return _viable


def _run_probe() -> None:
    """The probe body: compile + numerics for every dispatchable k/stride.

    On a real TPU backend the probe shapes must satisfy Mosaic's DMA lane
    alignment (see ``_lane_aligned``): C=128 for the NHWC-layout kernels,
    W=128 for the bhcw k3 variant — exactly the class of shapes
    ``pallas_eligible`` admits there.  Interpret mode keeps the tiny C=8
    shapes (no tiling, and ~100× faster for the CPU test suite).

    The lax reference runs at ``Precision.HIGHEST``: TPU default-precision
    fp32 convs are a bf16 decomposition that is itself ~3e-3 off (measured
    vs an fp64 golden, against which the stencils are ~1.6e-7) — comparing
    the exact stencil against the sloppy default would fail the probe for
    the reference's sins."""
    import numpy as np

    rng = np.random.default_rng(0)
    interp = _interpret()
    C = 8 if interp else 128
    x = jnp.asarray(rng.normal(size=(2, 16, 24, C)), jnp.float32)
    # The k3/dil1 route honours DLV3_DW_LAYOUT: bhcw slabs put W on lanes.
    if not interp and _layout() == "bhcw":
        x3 = jnp.asarray(rng.normal(size=(2, 16, 128, 8)), jnp.float32)
    else:
        x3 = x

    def check(fn, ref, kk, xv):
        cc = xv.shape[-1]
        k = jnp.asarray(rng.normal(size=(kk, kk, 1, cc)) * 0.2, jnp.float32)

        def loss(f):
            return lambda x, k: (f(x, k) ** 2).sum()

        y1 = jax.jit(fn)(xv, k)
        y2 = jax.jit(ref)(xv, k)
        gx1, gk1 = jax.jit(jax.grad(loss(fn), (0, 1)))(xv, k)
        gx2, gk2 = jax.jit(jax.grad(loss(ref), (0, 1)))(xv, k)
        for a, b in ((y1, y2), (gx1, gx2), (gk1, gk2)):
            err = float(jnp.abs(a - b).max())
            scale = float(jnp.abs(b).max()) + 1e-12
            if not err <= 1e-3 * scale:
                raise ValueError(
                    f"stencil/lax mismatch: {err} vs scale {scale}"
                )

    def ref_kd(strides, dil=(1, 1)):
        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, strides, "SAME", rhs_dilation=dil,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1],
                precision=jax.lax.Precision.HIGHEST,
            )
        return f

    check(depthwise3x3, ref_kd((1, 1)), 3, x3)
    check(lambda x, k: depthwise_stencil(x, k, (2, 2)), ref_kd((1, 1), (2, 2)), 3, x)
    check(depthwise3x3_s2, ref_kd((2, 2)), 3, x)
    check(depthwise_stencil, ref_kd((1, 1)), 5, x)
    check(depthwise_stencil_s2, ref_kd((2, 2)), 5, x)
    # k7 covers the NASNet reduction-cell routes — every k the
    # dispatcher can choose is numerically probed on this backend.
    check(depthwise_stencil, ref_kd((1, 1)), 7, x)
    check(depthwise_stencil_s2, ref_kd((2, 2)), 7, x)


def _pallas_wanted() -> bool:
    """Env override DLV3_PALLAS_DEPTHWISE: '1' force (interpret off-TPU,
    for tests), 'auto' = TPU backend + trivial mesh + a one-time probe
    compile, unset/'0' = lax (the DEFAULT).

    Default is OFF because the family was measured on a real v5e and
    LOST to the lax grouped conv at every flagship site (fwd+bwd,
    100-step scan, min-of-3): bhcw 5.9 ms vs lax 2.0 ms at 128²C144,
    5.3 vs 3.4 at 256²C32 (entry/exit transposes dominate); nhwc 0.78
    vs 0.59 at 32²C384 (its one natively lane-aligned site — real
    Mosaic rejects DMA slabs whose lane dim is not a 128-multiple, so
    nhwc needs C%128==0 and bhcw W%128==0).  XLA's depthwise lowering
    already runs at ~65% of the pure HBM-traffic floor; there is no
    headroom worth the kernel.  Kept for its exact-fp32 numerics
    (stencil ≈1.6e-7 rel vs fp64 golden where lax's bf16 decomposition
    is ~3e-3 off) and as a measured exploration (see KERNELS.md)."""
    mode = os.environ.get("DLV3_PALLAS_DEPTHWISE", "0")
    if mode == "1":
        return True
    if mode == "auto":
        return (
            jax.default_backend() == "tpu"
            and _single_device_mesh
            and _probe_viable()
        )
    return False


def _lane_aligned(n: int) -> bool:
    """Real Mosaic stores HBM memrefs 128-lane-padded and rejects manual
    DMA slabs whose lane (minor) dim is not a 128-multiple ("Slice shape
    along dimension 3 must be aligned to tiling (128)" — measured on a
    v5e).  The minor dim is C for the NHWC-layout kernels (stride-1
    general-k and the stride-2 parity planes) and W for the bhcw k3
    variant.  Interpret mode has no tiling, so the CPU test suite keeps
    exercising the small-C shapes."""
    return _interpret() or n % 128 == 0


# VMEM working-set ceiling for eligibility (v5e VMEM ≈ 16 MB/core; leave
# headroom for the compiler's output double-buffering and spills).  The
# tile-size heuristics floor th at 8 (s1) / 4 (s2), so a large-dilation ×
# wide-channel site (e.g. an os-8 Xception ASPP split-sep depthwise at
# rate 18 on 1536+ channels) can exceed VMEM no matter the tiling — and
# that failure would surface at MODEL compile time, where the tiny-shape
# probe can't catch it.  Route such sites to lax statically instead.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_fit_s1(x_shape, k: int, dil, itemsize: int, layout: str) -> bool:
    """Backward-pass VMEM working set of the stride-1 kernels (the larger
    of fwd/bwd) against the budget."""
    B, H, W, C = x_shape
    if layout == "bhcw":
        th, cb = _tiles(H, C, W, itemsize)
        slab = (th + 2) * cb * W * itemsize
        out = th * cb * W * itemsize
        # bwd: x + g slabs (single-buffered) + dx out block
        return 2 * slab + out <= _VMEM_BUDGET_BYTES
    halo = (k - 1) * dil[0]
    th = _tiles_nhwc(H, W, C, itemsize, halo)
    slab = (th + halo) * W * C * itemsize
    out = th * W * C * itemsize
    # bwd: x + g slabs, each double-buffered, + dx out block
    return 4 * slab + out <= _VMEM_BUDGET_BYTES


def _vmem_fit_s2(x_shape, k: int, itemsize: int) -> bool:
    """Backward-pass VMEM working set of the stride-2 polyphase kernel."""
    span, _, gpad, _ = _s2_geometry(k)
    B, H, W, C = x_shape
    Ho, Wh = H // 2, W // 2
    th = _tiles_s2(Ho, Wh, C, itemsize)
    plane_slabs = sum(
        (th + span[p]) * (Wh + span[q]) * C * itemsize
        for p in (0, 1)
        for q in (0, 1)
    )
    gspan = gpad[0] + gpad[1]
    g_slab = (th + gspan) * (Wh + gspan) * C * itemsize
    out = th * Wh * C * itemsize
    # bwd: 4 plane slabs + g slab, each double-buffered, + 4 dx out blocks
    return 2 * (plane_slabs + g_slab) + 4 * out <= _VMEM_BUDGET_BYTES


def pallas_eligible(x_shape, x_dtype, k_shape, strides, dilation, padding) -> bool:
    """Static trace-time eligibility for the stride-1 Pallas stencil.

    fp32 only: XLA lowers fp32 TPU convs as a ~3-pass bf16 decomposition,
    which for a near-zero-FLOP depthwise op is pure overhead (~10 ms of the
    94 ms flagship fp32 step); bf16 convs are already ~free (~0.5 ms
    measured), so they stay on the MXU path.  Covers odd k ∈ {3, 5, 7} and
    any dilation whose W-shifts stay inside the image (the flagship's
    dilated ASPP split-sep branches, EfficientNet k5, NASNet k5/7).
    """
    if len(x_shape) != 4 or x_dtype != jnp.float32:
        return False
    k = k_shape[0]
    if k not in (3, 5, 7) or tuple(k_shape[:3]) != (k, k, 1):
        return False
    if k_shape[3] != x_shape[3]:
        return False
    if tuple(strides) != (1, 1):
        return False
    if padding != "SAME":
        return False
    dh, dw = int(dilation[0]), int(dilation[1])
    if dh < 1 or dw < 1:
        return False
    B, H, W, C = x_shape
    if (k // 2) * dw >= W:
        return False
    if not (C % 8 == 0 and H >= 4 and W >= 8):
        return False
    layout = _layout() if k == 3 and (dh, dw) == (1, 1) else "nhwc"
    if not _lane_aligned(W if layout == "bhcw" else C):
        return False
    return _vmem_fit_s1(x_shape, k, (dh, dw), jnp.dtype(x_dtype).itemsize, layout)


def pallas_eligible_s2(x_shape, x_dtype, k_shape, strides, dilation, padding) -> bool:
    """Eligibility for the stride-2 polyphase stencil (odd k, even H/W)."""
    if len(x_shape) != 4 or x_dtype != jnp.float32:
        return False
    k = k_shape[0]
    if k not in (3, 5, 7) or tuple(k_shape[:3]) != (k, k, 1):
        return False
    if k_shape[3] != x_shape[3]:
        return False
    if tuple(strides) != (2, 2) or tuple(dilation) != (1, 1):
        return False
    if padding != "SAME":
        return False
    B, H, W, C = x_shape
    if not (C % 8 == 0 and H % 2 == 0 and W % 2 == 0 and H >= 8 and W >= 16):
        return False
    if not _lane_aligned(C):  # parity planes keep C on lanes
        return False
    return _vmem_fit_s2(x_shape, k, jnp.dtype(x_dtype).itemsize)


# Per-site compile-probe verdicts, keyed by the full static signature.
# Mosaic's alignment acceptance is NOT statically predictable from simple
# divisibility (measured on a v5e: a dilation-2 sublane shift compiles at
# W=24/C=128 and at W=32/C=384 but is rejected at W=16/C=384 — "Slice
# shape along dimension 2 must be aligned to tiling (8)"), so the final
# dispatch gate AOT-compiles the exact kernel for the exact site shapes
# (abstract inputs — no data, no execution) and falls back to lax for
# that site on any rejection.  One-time per signature per process.
_site_ok: dict = {}


def _site_compile_ok(x_shape, x_dtype, k_shape, dilation, stride2: bool) -> bool:
    if _interpret():
        return True
    key = (
        tuple(x_shape), jnp.dtype(x_dtype).str, tuple(k_shape),
        tuple(dilation), stride2, _layout(),
    )
    hit = _site_ok.get(key)
    if hit is not None:
        return hit

    import threading

    box = {}

    def _work():
        # A worker thread escapes any ambient jit trace (trace state is
        # thread-local) — same pattern as _probe_viable.
        try:
            if stride2:
                f = lambda x, k: depthwise_stencil_s2(x, k)  # noqa: E731
            else:
                f = lambda x, k: depthwise_stencil(x, k, dilation)  # noqa: E731
            xa = jax.ShapeDtypeStruct(tuple(x_shape), x_dtype)
            ka = jax.ShapeDtypeStruct(tuple(k_shape), x_dtype)
            jax.jit(f).lower(xa, ka).compile()

            def loss(x, k):
                return (f(x, k) ** 2).sum()

            jax.jit(jax.grad(loss, (0, 1))).lower(xa, ka).compile()
            box["ok"] = True
        except Exception as e:  # pragma: no cover - backend-specific
            box["err"] = e

    t = threading.Thread(target=_work, name="dlv3-depthwise-site-probe")
    t.start()
    t.join()
    ok = bool(box.get("ok"))
    if not ok:
        import warnings

        warnings.warn(
            f"Pallas depthwise stencil rejected by the backend compiler for "
            f"site {key[:5]}; using lax for it: {str(box.get('err'))[:200]}"
        )
    _site_ok[key] = ok
    return ok


def depthwise_conv(
    x: jax.Array,
    kernel: jax.Array,
    *,
    strides=(1, 1),
    dilation=(1, 1),
    padding="SAME",
) -> jax.Array:
    """Depthwise conv (NHWC, HWIO with I=1) with automatic Pallas dispatch.

    Numerically matches ``lax.conv_general_dilated(feature_group_count=C)``;
    on the Pallas path fp32 taps are true fp32 FMAs (strictly *more*
    accurate than XLA's bf16×3 TPU decomposition of fp32 convs).
    """
    if _pallas_wanted():
        args = (x.shape, x.dtype, kernel.shape, strides, dilation, padding)
        if pallas_eligible(*args) and _site_compile_ok(
            x.shape, x.dtype, kernel.shape, dilation, stride2=False
        ):
            return depthwise_stencil(x, kernel, dilation)
        if pallas_eligible_s2(*args) and _site_compile_ok(
            x.shape, x.dtype, kernel.shape, dilation, stride2=True
        ):
            return depthwise_stencil_s2(x, kernel)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        tuple(strides),
        padding,
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
