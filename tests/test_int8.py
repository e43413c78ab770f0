"""int8 PTQ inference path (ops/quant.py, models.blocks.QuantConv).

VERDICT r3 item 2: the on-chip probe (tools/int8_probe.py) measured int8 at
1.6-2× on MXU-bound convs (Xception's 728-wide pointwise middle flow);
this suite pins the path's correctness and quality:

- the float path of QuantConv is bit-identical to ``nn.Conv`` (weight
  transplants and all float parity suites are untouched);
- calibration records ranges ONLY at eligible sites (both channel counts
  ≥ 128 — the measured-profitable class; the 21-class classifier and thin
  convs stay float);
- the quantized model's predictions agree with the float model's;
- on a TRAINED model (synthetic learnable task), int8 inference loses
  ≤ 1 mIoU point vs fp32 — the quality gate for the deployment claim;
- the public API path: ``int8_infer: true`` → evaluate/test/segment run
  quantized end-to-end.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from flax import linen as nn

from synthetic_task import make_batch, miou, np_cm

from deeplabv3plus_keras_tpu.config import Config, MiddleOp
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.models.blocks import QuantConv
from deeplabv3plus_keras_tpu.ops import quant


def _conf(reduction=128, size=64, batch=4, refinement=False):
    conf = Config()
    conf.base_model = "mobilenetv2"
    conf.nn_arch.image_size = size
    conf.nn_arch.boundary_refinement = refinement
    conf.nn_arch.reduction_size = reduction
    conf.nn_arch.concat_channels = reduction
    conf.nn_arch.dropout_rate = 0.0
    # input=0 chaining makes the later branches reduction→reduction convs
    # (the eligible class when reduction ≥ 128)
    conf.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=1, input=-1),
        MiddleOp(op="conv", kernel=3, rate=(2, 1), input=0),
        MiddleOp(op="conv", kernel=1, input=1),
    ]
    conf.hps.batch_size = batch
    return conf


def test_quantconv_float_path_matches_nn_conv():
    rng = np.random.default_rng(0)
    for cin, cout, k, s in [(160, 192, 1, 1), (96, 64, 3, 2), (130, 128, 3, 1)]:
        x = jnp.asarray(rng.uniform(-2, 2, (2, 9, 9, cin)), jnp.float32)
        qc = QuantConv(cout, kernel=k, strides=s)
        ref = nn.Conv(cout, (k, k), strides=(s, s), use_bias=False, padding="SAME")
        v = qc.init(jax.random.PRNGKey(0), x)
        assert set(v) == {"params"}  # no quant state created at init
        y = qc.apply(v, x)
        y_ref = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_int8_conv_dequant_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-3, 3, (2, 8, 8, 128)), jnp.float32)
    qc = QuantConv(256, kernel=1)
    v = qc.init(jax.random.PRNGKey(0), x)
    y_f = qc.apply(v, x)
    _, mut = qc.apply(v, x, mutable=["quant"])
    y_q = qc.apply({**v, "quant": mut["quant"]}, x)
    rel = float(
        np.abs(np.asarray(y_q) - np.asarray(y_f)).max()
        / np.abs(np.asarray(y_f)).max()
    )
    assert rel < 0.02, rel  # per-tensor s8 activations × per-channel s8 weights


def test_calibration_covers_only_eligible_sites():
    conf = _conf(reduction=128)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    q = quant.calibrate(model, variables, [x])
    flat = jax.tree_util.tree_flatten_with_path(q)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]
    # every recorded range is positive and belongs to an encoder-middle or
    # backbone site; the 48-ch refinement conv and 21-class classifier
    # never appear (channel gate)
    assert names, "no sites calibrated"
    for name, leaf in zip(names, [l for _, l in flat]):
        assert float(leaf) > 0, name
        assert "classifier" not in name and "refine" not in name, name
    # the encoder projection (concat→128) and chained branches are in
    assert any("projection" in n for n in names), names


def test_spatial_gate_excludes_large_maps():
    """Round-5 spatial gate (quant.MAX_QUANT_PIXELS): channel-eligible
    convs at spatial sizes above the gate stay float (the 127²-entry
    q/dq path measured 5× slower standalone, e2e-neutral — probe table
    in PERFORMANCE.md), while small-map sites keep calibrating; the
    quantized model still runs and matches float predictions."""
    # Xception: eligible pointwise sites live at three spatial sizes at
    # image 64 (block3 pw at 16²=256 px, block4 at 8²=64 px, middle flow
    # at 4²=16 px), so the spatial gate has a population to split.
    conf = _conf(reduction=128, size=64, batch=2)
    conf.base_model = "xception"
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    x = np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    orig = quant.MAX_QUANT_PIXELS
    try:
        quant.MAX_QUANT_PIXELS = None
        q_all = quant.calibrate(model, variables, [x])
        n_all = len(jax.tree.leaves(q_all))
        # gate below every site's pixel count
        quant.MAX_QUANT_PIXELS = 8
        with pytest.raises(ValueError, match="no quantizable conv"):
            quant.calibrate(model, variables, [x])
        # gate admitting only the smaller maps: strictly fewer sites
        # than ungated, and inference still agrees with float
        quant.MAX_QUANT_PIXELS = 64
        q_small = quant.calibrate(model, variables, [x])
        n_small = len(jax.tree.leaves(q_small))
        assert 0 < n_small < n_all, (n_small, n_all)
        probs_f = model.apply(variables, jnp.asarray(x), train=False)
        probs_q = model.apply(
            dict(variables, quant=q_small), jnp.asarray(x), train=False
        )
        assert float(jnp.abs(probs_f - probs_q).max()) < 0.15
    finally:
        quant.MAX_QUANT_PIXELS = orig


def test_int8_sites_in_swapped_backbones():
    """Round-4 QuantConv swap inside the backbones (DenseNet dense-layer
    bottlenecks + transition convs, EfficientNet MBConv expand/project,
    NASNet separable pointwise): calibration must discover the backbone
    sites whose channel counts pass the gate, and the quantized model's
    predictions must stay close to float.  Measured site census at the
    os16 cut: densenet121 43 backbone sites, efficientnetb4 11,
    efficientnetb0 0 (all its cut-region channel counts < 128),
    nasnetmobile 0 (pointwise widths 44-176; only nasnetlarge passes) —
    for the 0-site backbones the swap is inert (float path bit-identical,
    test_quantconv_float_path_matches_nn_conv)."""
    for base, min_sites in [("densenet121", 30), ("efficientnetb4", 8)]:
        conf = _conf(reduction=128, size=64, batch=2)
        conf.base_model = base
        model, variables = init_model(conf, jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32
        )
        q = quant.calibrate(model, variables, [x])
        flat = jax.tree_util.tree_flatten_with_path(q)[0]
        names = ["/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat]
        backbone = [n for n in names if n.startswith("base/")]
        assert len(backbone) >= min_sites, (base, len(backbone), backbone[:5])
        y_f = model.apply(variables, x, train=False)
        y_q = model.apply(dict(variables, quant=q), x, train=False)
        err = float(np.abs(np.asarray(y_q) - np.asarray(y_f)).max())
        assert err < 0.02, (base, err)  # softmax probability space


def test_int8_model_quality_on_trained_net():
    """Train on the learnable task, then compare fp32 vs int8-calibrated
    inference on held-out data: mIoU drop must be ≤ 0.01 (the VERDICT r3
    quality gate for the deployment claim).  Batch-statistics forward in
    BOTH arms (BN momentum 0.999 leaves moving averages unusable at this
    step count; see test_accuracy_parity's docstring)."""
    import os

    from deeplabv3plus_keras_tpu.parallel.step import (
        build_train_step,
        create_train_state,
    )

    n_steps = int(os.environ.get("DLV3_INT8_STEPS", "200"))
    size, batch = 96, 4
    conf = _conf(reduction=128, size=size, batch=batch)
    conf.hps.lr = 1e-3
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    train_step = jax.jit(build_train_step(model, tx, conf))
    eye = np.eye(21, dtype=np.float32)
    data_rng = np.random.default_rng(5)
    for _ in range(n_steps):
        x, lab = make_batch(data_rng, batch, size)
        state, _ = train_step(
            state,
            {
                "image": jnp.asarray(x),
                "label": jnp.asarray(eye[lab]),
                "valid": jnp.ones((batch,), jnp.int32),
            },
            jax.random.PRNGKey(1),
        )

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    # calibrate on TRAINING-distribution batches, batch-stats forward
    calib = [make_batch(np.random.default_rng(7 + i), batch, size)[0] for i in range(4)]
    q = quant.calibrate(model, trained, calib, train=True)

    def score(with_quant):
        vars_ = dict(trained, quant=q) if with_quant else trained
        apply_bs = jax.jit(
            lambda v, x: model.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )[0]
        )
        cm = np.zeros((21, 21), np.int64)
        for i in range(4):
            x, lab = make_batch(np.random.default_rng(1000 + i), batch, size)
            p = np.asarray(apply_bs(vars_, jnp.asarray(x)))
            cm += np_cm(lab, p.argmax(-1))
        return miou(cm)

    miou_f, miou_q = score(False), score(True)
    print(f"fp32 {miou_f:.4f} int8 {miou_q:.4f}", flush=True)
    assert miou_f >= 0.15, miou_f  # the net actually learned
    assert miou_q >= miou_f - 0.01, (miou_f, miou_q)


def test_int8_eval_invariant_to_mesh():
    """Quantized inference must partition like the float model: the int8
    eval step on a ('data','space') mesh matches single-device int8
    numerics (GSPMD halos the s8 convs; scales are replicated jit
    constants)."""
    from deeplabv3plus_keras_tpu.parallel import (
        build_eval_step,
        create_train_state,
        make_mesh,
        shard_step,
    )

    conf = _conf(reduction=128, size=64, batch=8)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)), jnp.float32),
        "label": jax.nn.one_hot(jnp.asarray(rng.integers(0, 21, (8, 64, 64))), 21),
        "valid": jnp.ones((8,), jnp.int32),
    }
    q = quant.calibrate(model, variables, [batch["image"]])
    state, _ = create_train_state(conf, variables)
    e1 = shard_step(
        build_eval_step(model, conf, quant=q),
        make_mesh(n_data=1, n_space=1),
        kind="eval",
    )
    e2 = shard_step(
        build_eval_step(model, conf, quant=q),
        make_mesh(n_data=2, n_space=4),
        kind="eval",
        spatial=True,
    )
    r1, r2 = e1(state, batch), e2(state, batch)
    np.testing.assert_allclose(float(r1["loss"]), float(r2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r1["probs"]), np.asarray(r2["probs"]), atol=1e-5
    )


def test_int8_api_end_to_end(tmp_path):
    """Public surface: int8_infer drives evaluate/test/segment quantized."""
    from deeplabv3plus_keras_tpu.api import SemanticSegmentation
    from deeplabv3plus_keras_tpu.data import make_synthetic_voc

    root = str(tmp_path / "resource")
    make_synthetic_voc(root, n_train=4, n_val=2, n_test=2)
    conf = _conf(reduction=128, size=64, batch=2)
    conf.resource_path = root
    conf.extra["int8_infer"] = True
    conf.extra["int8_calib_batches"] = 2
    ss = SemanticSegmentation(conf, work_dir=str(tmp_path))

    m = ss.evaluate()
    assert ss._quant, "evaluate did not calibrate"
    assert 0.0 <= m.result() <= 1.0
    ss.test()
    out = sorted((tmp_path / "test_results").iterdir())
    assert len(out) == 2, out
    labels = ss.segment(np.zeros((1, 64, 64, 3), np.float32))
    assert labels.shape == (1, 64, 64) and labels.max() <= 20
