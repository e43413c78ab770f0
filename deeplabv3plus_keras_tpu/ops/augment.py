"""On-device train-time data augmentation (beyond-parity addition).

The reference trains with NO augmentation — its pipeline is a
deterministic resize+pad (semantic_segmentation.py:1515-1603), which is
one reason its published trajectory plateaus at mIoU ~0.34 after two
epochs (deeplabv3plus_keras.ipynb cell 29).  The standard DeepLabV3+
recipe augments every sample with a random horizontal flip and a random
scale jitter + crop; this module provides both as a single fused,
jit-compatible resample that runs inside the training step (no extra
dispatch, no host work, static shapes).

Geometry.  One affine resample expresses the whole scale+crop/pad family
with STATIC output shape (S, S):

    out(y, x) = in((y - ty) / z, (x - tx) / z)

with per-sample zoom ``z`` and translation ``(ty, tx)``:
- z > 1 zooms in: the offset range ``S - S·z`` is negative, so the
  sampled window is a random crop of the enlarged image;
- z < 1 zooms out: the range is positive, so the shrunk image lands at a
  random position and the outside is filled (image fill 0.0 — the same
  mid-gray the letterbox pad produces after (−1,1) normalization;
  label fill class 0, matching the reference's zero-padded labels).

Images are sampled bilinearly, labels with nearest-neighbor (an exact
pixel permutation — never invents classes at boundaries; works
identically for one-hot (S,S,C) and sparse integer (S,S) labels).

Config surface (extra key ``augment``; default absent = off, keeping
bit-exact reference-trajectory parity):

    "augment": true                      → flip + scale [0.5, 2.0]
    "augment": {"random_flip": true,     → each knob individually
                "scale_range": [0.75, 1.25]}
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def parse_augment_conf(value: Any):
    """Normalize the ``augment`` extra-config value → (flip, scale_range).

    Returns None when augmentation is disabled.  scale_range is None for
    flip-only augmentation."""
    if not value:
        return None
    flip, scale_range = True, (0.5, 2.0)
    if isinstance(value, dict):
        flip = bool(value.get("random_flip", True))
        sr = value.get("scale_range", (0.5, 2.0))
        scale_range = None if sr in (None, False) else (float(sr[0]), float(sr[1]))
        if scale_range is not None:
            lo, hi = scale_range
            if not (0.0 < lo <= hi):
                raise ValueError(f"augment scale_range must be 0 < lo <= hi, got {sr}")
    if not flip and scale_range is None:
        return None
    return flip, scale_range


def sample_params(rng, batch: int, flip: bool, scale_range):
    """Per-sample augmentation parameters.

    Returns dict of (B,) arrays: ``flip`` (bool), ``z`` zoom, ``ty``/``tx``
    translation in output pixels (resolved against the image size at apply
    time via the unit offset u ∈ [0, 1]: t = u · (S − S·z))."""
    r_flip, r_z, r_ty, r_tx = jax.random.split(rng, 4)
    do_flip = (
        jax.random.bernoulli(r_flip, 0.5, (batch,))
        if flip
        else jnp.zeros((batch,), bool)
    )
    if scale_range is not None:
        lo, hi = scale_range
        z = jax.random.uniform(r_z, (batch,), minval=lo, maxval=hi)
    else:
        z = jnp.ones((batch,), jnp.float32)
    uy = jax.random.uniform(r_ty, (batch,))
    ux = jax.random.uniform(r_tx, (batch,))
    return {"flip": do_flip, "z": z, "uy": uy, "ux": ux}


def _axis_coords(size: int, z, u):
    """Source coordinates for one axis: src = (idx − t) / z with
    t = u · (size − size·z) — a crop offset when z > 1, a placement
    offset when z < 1."""
    t = u * (size - size * z)
    src = (jnp.arange(size, dtype=jnp.float32) - t) / z
    return src


def _resample_image(img, z, uy, ux):
    """Bilinear resample of one (S, S, C) image; out-of-range fills 0.0."""
    S = img.shape[0]
    sy = _axis_coords(S, z, uy)
    sx = _axis_coords(S, z, ux)
    vy = (sy >= 0.0) & (sy <= S - 1.0)
    vx = (sx >= 0.0) & (sx <= S - 1.0)

    def gather_lerp(arr, src, axis_len):
        i0f = jnp.floor(src)
        w1 = src - i0f
        i0 = jnp.clip(i0f.astype(jnp.int32), 0, axis_len - 1)
        i1 = jnp.clip(i0 + 1, 0, axis_len - 1)
        return arr[i0], arr[i1], w1

    top, bot, wy = gather_lerp(img, sy, S)
    col = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
    colT = col.swapaxes(0, 1)  # (W_src→rows) for the x gather
    left, right, wx = gather_lerp(colT, sx, S)
    out = (left * (1.0 - wx)[:, None, None] + right * wx[:, None, None]).swapaxes(0, 1)
    return out * (vy[:, None] & vx[None, :])[:, :, None]


def _resample_label(lab, z, uy, ux):
    """Nearest-neighbor resample of one integer (S, S) label; out-of-range
    fills class 0 (background, the reference's zero-pad convention).

    Two per-axis gathers — a single fused 2-D index gather measured 6×
    SLOWER on the v5e (XLA lowers the 2-D index array to a general gather;
    per-axis 1-D indexing keeps the fast slice-like form)."""
    S = lab.shape[0]
    sy = _axis_coords(S, z, uy)
    sx = _axis_coords(S, z, ux)
    iy = jnp.clip(jnp.rint(sy).astype(jnp.int32), 0, S - 1)
    ix = jnp.clip(jnp.rint(sx).astype(jnp.int32), 0, S - 1)
    valid = ((sy >= -0.5) & (sy <= S - 0.5))[:, None] & (
        (sx >= -0.5) & (sx <= S - 0.5)
    )[None, :]
    out = lab[iy][:, ix]
    return jnp.where(valid, out, jnp.zeros((), out.dtype))


def apply_augment(image, label, params):
    """Apply sampled augmentation parameters to a batch.

    image: (B, S, S, 3) float; label: one-hot (B, S, S, C) float, sparse
    (B, S, S) int, or None.  Deterministic given ``params`` (tests drive
    this directly with handpicked values).

    One-hot labels are converted to their integer form up front (argmax is
    exact on a one-hot) so the flip and the nearest gathers move S² int32
    instead of S²·C floats, then re-encoded once at the end — numerically
    identical (nearest-neighbor is a pixel permutation).  Measured on the
    v5e (tools/augment_bench.py, flagship 512²·21 batch-16 fp32 step):
    the full augmentation costs +2.5 ms (2.9%); carrying the one-hot
    through the flip/gathers instead costs +9.8 ms."""
    one_hot = label is not None and label.ndim == 4
    lab_in = (
        jnp.argmax(label, axis=-1).astype(jnp.int32) if one_hot else label
    )

    def per_sample(img, lab, flip, z, uy, ux):
        img = jnp.where(flip, img[:, ::-1], img)
        img = _resample_image(img, z, uy, ux)
        if lab is None:
            return img, None
        lab2 = jnp.where(flip, lab[:, ::-1], lab)
        lab2 = _resample_label(lab2, z, uy, ux)
        return img, lab2

    if label is None:
        images = jax.vmap(lambda i, f, z, uy, ux: per_sample(i, None, f, z, uy, ux)[0])(
            image, params["flip"], params["z"], params["uy"], params["ux"]
        )
        return images, None
    images, labels = jax.vmap(per_sample)(
        image, lab_in, params["flip"], params["z"], params["uy"], params["ux"]
    )
    if one_hot:
        labels = jax.nn.one_hot(labels, label.shape[-1], dtype=label.dtype)
    return images, labels


def augment_batch(image, label, rng, *, flip: bool = True, scale_range=(0.5, 2.0)):
    """Sample per-image parameters from ``rng`` and apply them (see module
    docstring for semantics).  jit-compatible; called inside the training
    step so augmentation costs zero extra dispatches."""
    params = sample_params(rng, image.shape[0], flip, scale_range)
    return apply_augment(image, label, params)
