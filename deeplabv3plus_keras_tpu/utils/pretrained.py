"""Pretrained ImageNet backbone initialization, wired to the config.

The reference builds every backbone from ``tf.keras.applications`` with the
default ``weights='imagenet'`` (semantic_segmentation.py:494-771, e.g.
:496-499 MobileNetV2), so training always fine-tunes from ImageNet.  This
module gives the JAX framework the same capability through one extra config
key:

    "backbone_weights": "imagenet"          # download via keras.applications
    "backbone_weights": "/path/to/w.h5"     # offline .h5 / .weights.h5 file
    (absent / null)                         # random init (flax default)

Both paths go through utils/keras_weights.convert_keras_backbone — the
converter whose numerics are pinned by the ``-m parity`` suite against every
backbone in the zoo.  TensorFlow/Keras is only imported when the key is set.
"""

from __future__ import annotations

from typing import Any

from ..config import Config

# base_model name → keras.applications attribute.  Weights are
# spatial-size-independent (conv kernels + BN vectors), so the Keras
# architecture is built at the config's image_size like the reference, but
# any valid size would convert identically.
_KERAS_APP = {
    "mobilenetv2": "MobileNetV2",
    "xception": "Xception",
    "efficientnetb0": "EfficientNetB0",
    "efficientnetb1": "EfficientNetB1",
    "efficientnetb2": "EfficientNetB2",
    "efficientnetb3": "EfficientNetB3",
    "efficientnetb4": "EfficientNetB4",
    "efficientnetb5": "EfficientNetB5",
    "efficientnetb6": "EfficientNetB6",
    "efficientnetb7": "EfficientNetB7",
    "nasnetmobile": "NASNetMobile",
    "nasnetlarge": "NASNetLarge",
    "densenet121": "DenseNet121",
    "densenet169": "DenseNet169",
    "densenet201": "DenseNet201",
}


def keras_builder(base_model: str, image_size: int, weights=None):
    """Return a zero-arg callable building the matching Keras architecture
    (include_top=False, reference :496-499 et seq.)."""
    try:
        from tensorflow.keras import applications
    except Exception as e:  # pragma: no cover - TF missing
        raise RuntimeError(
            f"backbone_weights requires TensorFlow/Keras to build the source "
            f"architecture ({type(e).__name__}: {e})"
        ) from e
    app_fn = getattr(applications, _KERAS_APP[base_model])

    def build():
        return app_fn(
            input_shape=(image_size, image_size, 3),
            include_top=False,
            weights=weights,
        )

    return build


def load_pretrained_backbone(
    conf: Config, variables, base_path: str = "base"
) -> tuple[Any, dict | None]:
    """Replace the backbone subtree of ``variables`` per
    ``conf.extra['backbone_weights']``; no-op when the key is unset.

    Returns (variables, conversion report | None).  Raises if the source
    leaves any backbone layer unconverted — silently training a half-random
    'pretrained' backbone would be worse than failing.
    """
    spec = conf.extra.get("backbone_weights")
    if not spec:
        return variables, None
    if conf.base_model not in _KERAS_APP:
        raise ValueError(f"unknown base_model {conf.base_model!r}")

    from .keras_weights import convert_keras_backbone

    size = conf.nn_arch.image_size
    if spec == "imagenet":
        model = keras_builder(conf.base_model, size, weights="imagenet")()
    else:
        model = keras_builder(conf.base_model, size, weights=None)()
        model.load_weights(spec)
    variables, report = convert_keras_backbone(model, variables, base_path=base_path)
    if report["missing"]:
        raise RuntimeError(
            f"backbone_weights: {len(report['missing'])} layers not found in "
            f"the Keras source, e.g. {report['missing'][:5]}"
        )
    return variables, report
