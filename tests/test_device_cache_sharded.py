"""Sharded HBM-resident dataset on the 8-virtual-device mesh: per-shard
local gathers must cover every sample exactly once per epoch with pixels
identical to the streaming path, and feed the sharded train step."""

import pytest

pytestmark = pytest.mark.slow  # shard_map compiles on the 1-CPU host

import numpy as np

from deeplabv3plus_keras_tpu.data import (
    HostLoader,
    MODE_TRAIN,
    make_synthetic_voc,
    pascal_voc_2012,
)
from deeplabv3plus_keras_tpu.data.pipeline import DeviceDataset, device_batches


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_synthetic_voc(
        str(tmp_path_factory.mktemp("voc")), n_train=11, n_val=0, n_test=0,
        min_size=40, max_size=64,
    )


def host_reference(specs):
    """name → (image, label) from the streaming path."""
    ref = {}
    loader = HostLoader(specs, batch_size=4, canvas_size=64, workers=1)
    for b in device_batches(loader, 64, 21):
        v = np.asarray(b["valid"]).astype(bool)
        img = np.asarray(b["image"])
        lab = np.asarray(b["label"])
        for i, name in enumerate(b["names"]):
            if v[i]:
                ref[name] = (img[i], lab[i])
    return ref


@pytest.mark.parametrize("shuffle", [False, True])
def test_sharded_dataset_coverage_and_pixels(voc_root, shuffle):
    from deeplabv3plus_keras_tpu.parallel import make_mesh

    specs = pascal_voc_2012(voc_root, MODE_TRAIN)  # 11 samples
    mesh = make_mesh(n_data=4, n_space=2)
    ds = DeviceDataset(
        HostLoader(specs, batch_size=8, canvas_size=64, workers=1,
                   shuffle=shuffle, seed=3),
        mesh=mesh,
    )
    assert ds.shards == 4 and ds.steps() == 2
    ref = host_reference(specs)

    for _epoch in range(2):
        seen = []
        for b in device_batches(ds, 64, 21):
            v = np.asarray(b["valid"]).astype(bool)
            img = np.asarray(b["image"])
            lab = np.asarray(b["label"])
            assert len(b["names"]) == 8  # positional, placeholders included
            for i, name in enumerate(b["names"]):
                if not v[i]:
                    assert name == ""
                    # zero canvases normalize to 2*(0/255-0.5) = -1
                    np.testing.assert_array_equal(img[i], -1.0)
                    continue
                seen.append(name)
                np.testing.assert_allclose(img[i], ref[name][0], atol=1e-6)
                np.testing.assert_array_equal(lab[i], ref[name][1])
        # exactly once per epoch
        assert sorted(seen) == sorted(s.name for s in specs)


def test_sharded_dataset_feeds_train_step(voc_root):
    import jax, sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_sharding import tiny_conf

    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_train_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    conf = tiny_conf(8)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    mesh = make_mesh(n_data=4, n_space=2)
    step = shard_step(
        build_train_step(model, tx, conf), mesh, kind="train", spatial=True
    )
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    ds = DeviceDataset(
        HostLoader(specs, batch_size=8, canvas_size=64, workers=1), mesh=mesh
    )
    losses = []
    for b in device_batches(ds, conf.nn_arch.image_size, 21):
        b.pop("names")
        state, m = step(state, b, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
