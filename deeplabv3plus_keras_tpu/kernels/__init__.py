from .upsample_argmax import upsample_argmax, upsample_argmax_reference

__all__ = ["upsample_argmax", "upsample_argmax_reference"]
