"""Full DeepLabV3+ model: backbone → encoder middle (ASPP DAG) → decoder.

Reference forward pass (SURVEY §3.4; semantic_segmentation.py:777-782):
input (B, S, S, 3) in (−1, 1) → base → encoder middle → decoder →
(B, S, S, num_classes) softmax probabilities.

This module is a pure flax.linen functional core — ``init`` produces the
param/batch-stats pytrees, ``apply`` is the jittable forward.  The
backbone output is computed once and shared by the encoder middle and the
boundary-refinement path (the reference executes the backbone twice on the
same input, :802 and :930 — identical numerics, see decoder.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .backbones import get_backbone
from .decoder import Decoder
from .encoder import EncoderMiddle


_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    # f64 exists for the fp64 trajectory-parity suite (requires
    # jax_enable_x64); never a TPU production dtype.
    "float64": jnp.float64,
}


def _at_least_f32(x):
    """Model outputs are ≥fp32: bf16/f16 compute upcasts (loss/mIoU stay
    fp32), f64 passes through."""
    return x.astype(jnp.promote_types(jnp.result_type(x), jnp.float32))


class DeepLabV3Plus(nn.Module):
    """conf: the full Config (hps + nn_arch drive every knob)."""

    conf: Config

    def setup(self):
        arch = self.conf.nn_arch
        hps = self.conf.hps
        dtype = _DTYPES.get(hps.dtype, jnp.float32)
        self.base = get_backbone(self.conf.base_model, arch.output_stride, dtype=dtype)
        # extra config key 'remat': rematerialize backbone activations in
        # the backward pass (jax.checkpoint) — trades ~⅓ more FLOPs for a
        # large activation-memory cut, enabling bigger batches at 512².
        self._remat = bool(self.conf.extra.get("remat", False))
        self.encoder = EncoderMiddle(
            middle_conf=tuple(arch.encoder_middle_conf),
            reduction_size=arch.reduction_size,
            concat_channels=arch.concat_channels,
            conv_rate_multiplier=arch.conv_rate_multiplier,
            dropout_rate=arch.dropout_rate,
            bn_momentum=hps.bn_momentum,
            bn_scale=hps.bn_scale,
            dtype=dtype,
            name="encoder",
        )
        self.decoder = Decoder(
            num_classes=arch.num_classes,
            output_stride=arch.output_stride,
            boundary_refinement=arch.boundary_refinement,
            bn_momentum=hps.bn_momentum,
            bn_scale=hps.bn_scale,
            dtype=dtype,
            fused_upconv=bool(self.conf.extra.get("fused_upconv", True)),
            name="decoder",
        )

    def __call__(self, x, train: bool = False, return_presample: bool = False):
        if self._remat and train:
            base_features = nn.remat(lambda m, xx: m(xx, True))(self.base, x)
        else:
            base_features = self.base(x, train)
        encoder_features = self.encoder(base_features, train)
        if return_presample:
            logits, up = self.decoder(
                base_features, encoder_features, train, return_presample=True
            )
            return _at_least_f32(logits), up
        probs = self.decoder(base_features, encoder_features, train)
        return _at_least_f32(probs)


def create_model(conf: Config) -> DeepLabV3Plus:
    return DeepLabV3Plus(conf=conf)


def init_model(conf: Config, rng: jax.Array):
    """Initialize variables: returns {'params': ..., 'batch_stats': ...}."""
    model = create_model(conf)
    size = conf.nn_arch.image_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return model, variables
