"""Backbone registry.

Mirrors the reference's 14-backbone ``elif`` ladder (semantic_segmentation
.py:494-771) as a registry of ``(module_class)`` keyed by the config's
``base_model`` string; every class takes ``output_stride`` and implements
the reference's exact truncation point.
"""

from __future__ import annotations

from ...config import (
    BASE_MODEL_DENSENET121,
    BASE_MODEL_DENSENET169,
    BASE_MODEL_DENSENET201,
    BASE_MODEL_EFFICIENTNETB0,
    BASE_MODEL_EFFICIENTNETB1,
    BASE_MODEL_EFFICIENTNETB2,
    BASE_MODEL_EFFICIENTNETB3,
    BASE_MODEL_EFFICIENTNETB4,
    BASE_MODEL_EFFICIENTNETB5,
    BASE_MODEL_EFFICIENTNETB6,
    BASE_MODEL_EFFICIENTNETB7,
    BASE_MODEL_MOBILENETV2,
    BASE_MODEL_NASNETLARGE,
    BASE_MODEL_NASNETMOBILE,
    BASE_MODEL_XCEPTION,
)
from .mobilenetv2 import MobileNetV2Backbone
from .xception import XceptionBackbone

_REGISTRY = {
    BASE_MODEL_MOBILENETV2: MobileNetV2Backbone,
    BASE_MODEL_XCEPTION: XceptionBackbone,
}


def _register_lazy():
    """EfficientNet/DenseNet/NASNet are imported lazily (they are larger
    module files); registration happens on first lookup."""
    if BASE_MODEL_EFFICIENTNETB0 not in _REGISTRY:
        try:
            from .efficientnet import EFFICIENTNET_BACKBONES

            _REGISTRY.update(EFFICIENTNET_BACKBONES)
        except ImportError:
            pass
    if BASE_MODEL_DENSENET121 not in _REGISTRY:
        try:
            from .densenet import DENSENET_BACKBONES

            _REGISTRY.update(DENSENET_BACKBONES)
        except ImportError:
            pass
    if BASE_MODEL_NASNETMOBILE not in _REGISTRY:
        try:
            from .nasnet import NASNET_BACKBONES

            _REGISTRY.update(NASNET_BACKBONES)
        except ImportError:
            pass


def get_backbone(name: str, output_stride: int, dtype=None):
    """Instantiate the backbone module for a config ``base_model`` name."""
    _register_lazy()
    if name not in _REGISTRY:
        raise ValueError(f"Unknown base_model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](output_stride=output_stride, dtype=dtype, name="base")


def available_backbones():
    _register_lazy()
    return sorted(_REGISTRY)
