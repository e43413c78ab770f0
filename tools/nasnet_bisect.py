"""Bisect NASNet divergence: compare flax vs keras intermediates."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from tensorflow import keras
from tensorflow.keras.applications import NASNetMobile

from deeplabv3plus_keras_tpu.models.backbones import get_backbone
from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone


def main():
    full = NASNetMobile(input_shape=(96, 96, 3), include_top=False, weights=None)
    bb = get_backbone("nasnetmobile", 8)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, report = convert_keras_backbone(full, variables, base_path="")
    assert not report["missing"], report["missing"][:5]

    out, mods = bb.apply(variables, x, train=False, capture_intermediates=True)
    inter = mods["intermediates"]

    def flax_out(path):
        node = inter
        for p in path.split("/"):
            node = node[p]
        v = node["__call__"][0]
        if isinstance(v, tuple):
            v = v[0]
        return np.asarray(v)

    probes = [
        ("stem_bn1", "stem_bn1"),
        ("reduction_concat_stem_1", "stem_1"),
        ("reduction_concat_stem_2", "stem_2"),
        ("normal_concat_0", "cell_0"),
        ("normal_concat_1", "cell_1"),
        ("normal_concat_3", "cell_3"),
    ]
    for kname, fpath in probes:
        try:
            klayer = full.get_layer(kname)
        except ValueError:
            print(kname, "missing in keras")
            continue
        kmodel = keras.Model(full.inputs, klayer.output)
        kv = kmodel.predict(x, verbose=0)
        fv = flax_out(fpath)
        if fv.shape != kv.shape:
            print(f"{kname}: SHAPE flax {fv.shape} keras {kv.shape}")
            continue
        d = np.abs(fv - kv)
        print(f"{kname}: shape {kv.shape} maxdiff {d.max():.6f} frac>1e-3 {(d > 1e-3).mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
