from .depthwise3 import (
    depthwise3x3,
    depthwise3x3_reference,
    depthwise3x3_s2,
    depthwise3x3_s2_reference,
    depthwise_conv,
    depthwise_stencil,
    depthwise_stencil_s2,
    set_single_device_mesh,
)
from .upsample_argmax import upsample_argmax, upsample_argmax_reference

__all__ = [
    "depthwise3x3",
    "depthwise3x3_reference",
    "depthwise3x3_s2",
    "depthwise3x3_s2_reference",
    "depthwise_conv",
    "depthwise_stencil",
    "depthwise_stencil_s2",
    "set_single_device_mesh",
    "upsample_argmax",
    "upsample_argmax_reference",
]
