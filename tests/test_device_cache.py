"""HBM-resident dataset (cache_device): the on-device gather path must
yield batches identical to the streaming host path — same composition,
order, names, masks, and pixel values — across shuffled epochs."""

import numpy as np
import pytest

from deeplabv3plus_keras_tpu.data import (
    HostLoader,
    MODE_TEST,
    MODE_TRAIN,
    make_synthetic_voc,
    pascal_voc_2012,
)
from deeplabv3plus_keras_tpu.data.pipeline import DeviceDataset, device_batches


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_synthetic_voc(
        str(tmp_path_factory.mktemp("voc")), n_train=7, n_val=0, n_test=3,
        min_size=40, max_size=64,
    )


def _collect(src, with_labels=True, one_hot=True):
    out = []
    for b in device_batches(src, 64, 21, with_labels, one_hot_labels=one_hot):
        out.append(
            {
                "image": np.asarray(b["image"]),
                "label": np.asarray(b["label"]) if with_labels else None,
                "valid": np.asarray(b["valid"]),
                "names": b["names"],
            }
        )
    return out


@pytest.mark.parametrize("shuffle", [False, True])
def test_device_dataset_matches_host_path(voc_root, shuffle):
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    kw = dict(batch_size=3, canvas_size=64, workers=1, shuffle=shuffle, seed=5)
    host = HostLoader(specs, **kw)
    ds = DeviceDataset(HostLoader(specs, **kw))
    assert ds.steps() == host.steps() == 3
    for epoch in range(2):  # shuffled epochs must track the host order
        a = _collect(host)
        b = _collect(ds)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x["names"] == y["names"]
            np.testing.assert_array_equal(x["valid"], y["valid"])
            # full-batch equality INCLUDING the padded tail (the gather
            # zeroes invalid rows exactly like the streaming canvases, so
            # BN tail statistics match); the fused gather+preprocess jit
            # reorders fp ops vs the standalone kernel: ~1 ulp on pixels.
            np.testing.assert_allclose(x["image"], y["image"], atol=1e-6)
            np.testing.assert_array_equal(x["label"], y["label"])


def test_device_dataset_unlabeled_and_sparse(voc_root):
    test_specs = pascal_voc_2012(voc_root, MODE_TEST)
    kw = dict(batch_size=2, canvas_size=64, workers=1, with_labels=False)
    a = _collect(HostLoader(test_specs, **kw), with_labels=False)
    b = _collect(DeviceDataset(HostLoader(test_specs, **kw)), with_labels=False)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x["image"], y["image"], atol=1e-6)

    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    kw = dict(batch_size=3, canvas_size=64, workers=1)
    a = _collect(HostLoader(specs, **kw), one_hot=False)
    b = _collect(DeviceDataset(HostLoader(specs, **kw)), one_hot=False)
    for x, y in zip(a, b):
        assert y["label"].ndim == 3  # sparse int labels
        np.testing.assert_array_equal(x["label"], y["label"])
