"""Sparse (integer) label path: identical numerics to the one-hot path
through the full train/eval steps."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.config import Config, MiddleOp
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import (

    build_eval_step,
    build_train_step,
    create_train_state,
    make_mesh,
    shard_step,
)


def test_sparse_equals_dense_through_steps():
    c = Config()
    c.base_model = "mobilenetv2"
    c.nn_arch.image_size = 32
    c.nn_arch.boundary_refinement = False
    c.nn_arch.reduction_size = 8
    c.nn_arch.concat_channels = 8
    c.nn_arch.encoder_middle_conf = [MiddleOp(op="conv", kernel=1, input=-1)]
    c.nn_arch.dropout_rate = 0.0
    c.hps.batch_size = 4

    model, variables = init_model(c, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=1)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (4, 32, 32, 3)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 21, (4, 32, 32)), jnp.int32)
    valid = jnp.asarray([1, 1, 1, 0], jnp.int32)
    dense = {"image": img, "label": jax.nn.one_hot(t, 21), "valid": valid}
    sparse = {"image": img, "label": t, "valid": valid}

    results = {}
    for name, batch in [("dense", dense), ("sparse", sparse)]:
        vars_copy = jax.tree.map(jnp.array, variables)
        state, tx = create_train_state(c, vars_copy)
        tstep = shard_step(build_train_step(model, tx, c), mesh, kind="train")
        estep = shard_step(build_eval_step(model, c), mesh, kind="eval")
        state, m = tstep(state, batch, jax.random.PRNGKey(1))
        em = estep(state, batch)
        results[name] = (
            float(m["loss"]),
            np.asarray(m["cm"]),
            float(em["loss"]),
            jax.tree.leaves(state.params),
        )

    dl, dcm, del_, dp = results["dense"]
    sl, scm, sel, sp = results["sparse"]
    np.testing.assert_allclose(dl, sl, rtol=1e-6)
    np.testing.assert_array_equal(dcm, scm)
    # post-step values see fp32 op-ordering noise: the sparse loss backward
    # is a dense one-hot contraction (scatter-free), mathematically equal to
    # the dense path's gradient but summed in a different order.
    np.testing.assert_allclose(del_, sel, rtol=1e-5)
    for a, b in zip(dp, sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_evaluate_result_saving_under_sparse_labels(tmp_path):
    """evaluate(result_saving=True) with sparse_labels: the label panel is
    rendered from the (S, S) int map, not a bogus per-row argmax
    (VERDICT r1 weak #5)."""
    import os
    import sys

    sys.path.insert(0, "tests")
    from test_end_to_end import small_conf_dict

    from deeplabv3plus_keras_tpu import SemanticSegmentation
    from deeplabv3plus_keras_tpu.data import make_synthetic_voc

    make_synthetic_voc(str(tmp_path / "resource"), n_train=4, n_val=2, n_test=1)
    conf = small_conf_dict(tmp_path, mode="evaluate")
    conf["sparse_labels"] = True
    ss = SemanticSegmentation(conf, work_dir=str(tmp_path))
    miou = ss.evaluate(mode=1, result_saving=True)
    assert 0.0 <= miou.result() <= 1.0

    from PIL import Image

    results = sorted(os.listdir(os.path.join(str(tmp_path), "results")))
    assert len(results) == 3  # 6 names → 3/3 reference-exact split
    panel = np.asarray(Image.open(os.path.join(str(tmp_path), "results", results[0])))
    assert panel.shape == (64, 64 * 4, 3)
    # label pane = scaled int map of the synthetic fixture's label (<=20),
    # grayscale-tiled: all three channels equal
    lab_pane = panel[:, 64:128]
    assert (lab_pane[..., 0] == lab_pane[..., 1]).all()
    assert lab_pane.max() <= int(20 * 255 / 21) + 1
