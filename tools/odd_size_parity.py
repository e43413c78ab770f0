"""Parity at canonical/odd input sizes (odd sizes flip every correct_pad
branch): Xception at 299, NASNetMobile at 224, MobileNetV2 at 225.

python tools/odd_size_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from tensorflow import keras

from deeplabv3plus_keras_tpu.models.backbones import get_backbone
from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone


def check(name, app, size, os_, cut=None, adjust_bn=None):
    full = app(input_shape=(size, size, 3), include_top=False, weights=None)
    if adjust_bn is not None:
        layer = None
        for l in full.layers:
            if l.name.startswith("activation"):
                src = l.input._keras_history[0]
                if getattr(src, "name", None) == adjust_bn:
                    layer = l
                    break
        trunc = keras.Model(full.inputs, layer.output)
    else:
        trunc = keras.Model(full.inputs, full.get_layer(cut).output)
    bb = get_backbone(name, os_)
    x = np.random.default_rng(0).uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v, rep = convert_keras_backbone(full, v, base_path="")
    ours = np.asarray(bb.apply(v, x, train=False))
    theirs = trunc.predict(x, verbose=0)
    d = np.abs(ours - theirs) if ours.shape == theirs.shape else None
    print(
        f"{name}@{size} os{os_}: missing {len(rep['missing'])} "
        f"shapes {ours.shape} vs {theirs.shape} "
        f"maxdiff {d.max() if d is not None else 'SHAPE MISMATCH'}",
        flush=True,
    )


def main():
    import tensorflow.keras.applications as apps

    check("xception", apps.Xception, 299, 16, cut="block13_sepconv2_bn")
    check("mobilenetv2", apps.MobileNetV2, 225, 16, cut="block_12_add")
    check("nasnetmobile", apps.NASNetMobile, 224, 16, adjust_bn="adjust_bn_reduce_8")


if __name__ == "__main__":
    main()
