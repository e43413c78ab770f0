"""prepro_device=-1 host (SciPy) path vs the on-device kernel: same batches
(reference dual CPU/GPU preprocessing, semantic_segmentation.py:158-195)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import numpy as np

from deeplabv3plus_keras_tpu.data import (

    HostLoader,
    MODE_TRAIN,
    device_batches,
    make_synthetic_voc,
    pascal_voc_2012,
)


def test_host_and_device_prepro_agree(tmp_path):
    root = make_synthetic_voc(str(tmp_path / "voc"), n_train=3, n_val=1, n_test=1)
    specs = pascal_voc_2012(root, MODE_TRAIN)

    def batches(host):
        loader = HostLoader(specs, batch_size=2, canvas_size=160, workers=1)
        return list(device_batches(loader, 64, 21, host_prepro=host))

    dev = batches(False)
    host = batches(True)
    assert len(dev) == len(host) == 2
    for d, h in zip(dev, host):
        np.testing.assert_array_equal(np.asarray(d["valid"]), np.asarray(h["valid"]))
        for i, v in enumerate(np.asarray(d["valid"])):
            if not v:
                continue
            np.testing.assert_allclose(
                np.asarray(d["image"][i]), np.asarray(h["image"][i]), atol=1e-4
            )
            agree = (
                np.asarray(d["label"][i]).argmax(-1)
                == np.asarray(h["label"][i]).argmax(-1)
            ).mean()
            assert agree > 0.995, agree
