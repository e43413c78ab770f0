from .voc import (
    MODE_TRAIN,
    MODE_VAL,
    MODE_TEST,
    SampleSpec,
    pascal_voc_2012,
    pascal_voc_2012_ext,
)
from .pipeline import HostLoader, device_batches, load_sample
from .synthetic import make_synthetic_voc

__all__ = [
    "MODE_TRAIN",
    "MODE_VAL",
    "MODE_TEST",
    "SampleSpec",
    "pascal_voc_2012",
    "pascal_voc_2012_ext",
    "HostLoader",
    "device_batches",
    "load_sample",
    "make_synthetic_voc",
]
