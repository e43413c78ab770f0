"""Multi-host input plumbing: per-process spec sharding (equal step counts)
and host-local → global batch assembly feeding the existing sharded steps."""

import pytest

import numpy as np

from deeplabv3plus_keras_tpu.parallel import globalize_batch, shard_specs


def test_shard_specs_partitions_and_pads():
    specs = list(range(10))
    shards = [shard_specs(specs, pi, 4) for pi in range(4)]
    # every host sees the same step count (ceil(10/4) = 3)
    assert all(len(s) == 3 for s in shards)
    # the real (unpadded) elements cover the dataset exactly once
    real = [specs[pi::4] for pi in range(4)]
    assert sorted(x for shard in real for x in shard) == specs
    # pads wrap within the host's own shard
    assert shards[2] == [2, 6, 2] and shards[3] == [3, 7, 3]
    # single process: identity
    assert shard_specs(specs, 0, 1) == specs


def test_shard_specs_more_hosts_than_samples():
    specs = ["a", "b"]
    shards = [shard_specs(specs, pi, 3) for pi in range(3)]
    assert all(len(s) == 1 for s in shards)
    assert shards == [["a"], ["b"], ["a"]]


def test_shard_specs_mark_duplicates_for_evaluation():
    """mark_duplicates stamps padding specs valid=False so multi-host
    evaluate never double-counts wrapped samples (ADVICE r2); the loader
    then emits them with a 0 batch-validity mask."""
    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    specs = [SampleSpec(name=f"s{i}", image_path=f"/x/{i}.jpg", label_path=None)
             for i in range(5)]
    shards = [shard_specs(specs, pi, 2, mark_duplicates=True) for pi in range(2)]
    assert all(len(s) == 3 for s in shards)
    # host 0 owns 0,2,4 (no pad); host 1 owns 1,3 + one wrapped pad
    assert [s.valid for s in shards[0]] == [True, True, True]
    assert [s.valid for s in shards[1]] == [True, True, False]
    assert shards[1][2].name == shards[1][0].name
    # originals are untouched (replace, not mutation)
    assert all(s.valid for s in specs)
    # empty-shard seed (more hosts than samples) is someone else's sample
    lone = shard_specs(specs[:2], 2, 3, mark_duplicates=True)
    assert [s.valid for s in lone] == [False]


def test_loader_zeroes_validity_of_marked_duplicates(tmp_path):
    """An invalid spec flows through HostLoader as valid=0 (decoded for
    shape stability, excluded from loss/CM by every consumer)."""
    import dataclasses

    from PIL import Image

    from deeplabv3plus_keras_tpu.data.pipeline import HostLoader
    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    img_path = str(tmp_path / "a.jpg")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    real = SampleSpec(name="a", image_path=img_path, label_path=None)
    pad = dataclasses.replace(real, valid=False)
    loader = HostLoader([real, pad], batch_size=2, canvas_size=16,
                        workers=1, with_labels=False, backend="pil")
    (batch,) = list(loader)
    assert batch["valid"].tolist() == [1, 0]


@pytest.mark.slow
def test_globalized_batch_matches_plain_dispatch():
    """On the 8-virtual-device mesh, a batch assembled from 'process-local'
    data must produce identical eval metrics to plain numpy dispatch."""
    import jax
    import jax.numpy as jnp
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_sharding import tiny_conf

    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_eval_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    conf = tiny_conf(8)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, _ = create_train_state(conf, variables)
    mesh = make_mesh(n_data=4, n_space=2)
    step = shard_step(build_eval_step(model, conf), mesh, kind="eval", spatial=True)

    rng = np.random.default_rng(3)
    batch = {
        "image": rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
        "label": np.eye(21, dtype=np.float32)[rng.integers(0, 21, (8, 32, 32))],
        "valid": np.ones((8,), np.int32),
    }
    plain = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    g = globalize_batch(batch, mesh, spatial=True)
    assert all(x.shape == batch[k].shape for k, x in g.items())
    globald = step(state, g)
    np.testing.assert_allclose(
        float(plain["loss"]), float(globald["loss"]), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(plain["cm"]), np.asarray(globald["cm"]))
