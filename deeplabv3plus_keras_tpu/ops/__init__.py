from .augment import apply_augment, augment_batch, parse_augment_conf
from .resize import affine_resize, resize_symmetric, tf_resize_images
from .preprocess import (
    normalize_image,
    clamp_label,
    one_hot,
    prepare_batch,
    host_prepare_sample,
)

__all__ = [
    "apply_augment",
    "augment_batch",
    "parse_augment_conf",
    "affine_resize",
    "resize_symmetric",
    "tf_resize_images",
    "normalize_image",
    "clamp_label",
    "one_hot",
    "prepare_batch",
    "host_prepare_sample",
]
