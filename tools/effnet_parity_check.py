"""One-off EfficientNet variant parity check vs keras.applications.

python tools/effnet_parity_check.py b4
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

CUTS = {
    "b2": {8: "block3c_add", 16: "block5d_add"},
    "b3": {8: "block3c_add", 16: "block5e_add"},
    "b4": {8: "block3d_add", 16: "block5f_add"},
    "b5": {8: "block3e_add", 16: "block5g_add"},
    "b6": {8: "block3f_add", 16: "block5h_add"},
    "b7": {8: "block3g_add", 16: "block5j_add"},
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "b4"
    import tensorflow.keras.applications as apps

    app = getattr(apps, f"EfficientNetB{variant[1]}")
    name = f"efficientnet{variant}"
    full = app(input_shape=(96, 96, 3), include_top=False, weights=None)
    for os_, cut in CUTS[variant].items():
        trunc = keras.Model(full.inputs, full.get_layer(cut).output)
        bb = get_backbone(name, os_)
        x = np.random.default_rng(0).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
        v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        v, rep = convert_keras_backbone(full, v, base_path="")
        ours = np.asarray(bb.apply(v, x, train=False))
        theirs = trunc.predict(x, verbose=0)
        d = np.abs(ours - theirs)
        print(
            f"{name} os{os_}: missing {len(rep['missing'])} shape {ours.shape} "
            f"maxdiff {d.max():.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
