from .deeplab import DeepLabV3Plus, create_model, init_model
from .backbones import get_backbone, available_backbones

__all__ = [
    "DeepLabV3Plus",
    "create_model",
    "init_model",
    "get_backbone",
    "available_backbones",
]
