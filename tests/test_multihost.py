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
