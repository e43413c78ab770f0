"""Sweep remaining backbone variants vs keras.applications (one-off).

python tools/backbone_parity_sweep.py
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

CASES = [
    ("efficientnetb2", "EfficientNetB2", {8: "block3c_add", 16: "block5d_add"}),
    ("efficientnetb3", "EfficientNetB3", {8: "block3c_add", 16: "block5e_add"}),
    ("efficientnetb6", "EfficientNetB6", {8: "block3f_add", 16: "block5h_add"}),
    ("densenet169", "DenseNet169", {8: "pool3_conv", 16: "pool4_conv"}),
]


def main():
    import tensorflow.keras.applications as apps

    for name, appname, cuts in CASES:
        app = getattr(apps, appname)
        full = app(input_shape=(96, 96, 3), include_top=False, weights=None)
        for os_, cut in cuts.items():
            trunc = keras.Model(full.inputs, full.get_layer(cut).output)
            bb = get_backbone(name, os_)
            x = np.random.default_rng(0).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
            v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
            v, rep = convert_keras_backbone(full, v, base_path="")
            ours = np.asarray(bb.apply(v, x, train=False))
            theirs = trunc.predict(x, verbose=0)
            d = np.abs(ours - theirs)
            print(
                f"{name} os{os_}: missing {len(rep['missing'])} "
                f"shape {ours.shape} maxdiff {d.max():.6f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
