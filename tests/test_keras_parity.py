"""Numerical parity vs Keras applications backbones.

The reference consumes ``tf.keras.applications`` backbones with pretrained
weights (semantic_segmentation.py:494-771).  These tests build the same
Keras topologies with *random* weights (no network needed), convert them
through utils/keras_weights, and require the flax backbone to reproduce
the truncated Keras model's outputs — validating topology, BN semantics,
padding conventions, and the weight converter in one go (SURVEY §7 "hard
parts": Keras→JAX weight conversion & numerical parity).

Slow on the 1-core CI host → marked 'parity'; run with
``pytest -m parity``.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

pytestmark = pytest.mark.parity


def keras_truncated(app_fn, cut_layer, size):
    from tensorflow import keras

    m = app_fn(input_shape=(size, size, 3), include_top=False, weights=None)
    return keras.Model(m.inputs, m.get_layer(cut_layer).output), m


def convert_and_compare(name, app_fn, cut_layer, os_, size, atol):
    from deeplabv3plus_keras_tpu.models.backbones import get_backbone
    from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone

    truncated, full = keras_truncated(app_fn, cut_layer, size)
    bb = get_backbone(name, os_)
    x = np.random.default_rng(0).uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # bare backbone init → no 'base' wrapper level in the pytree
    variables, report = convert_keras_backbone(full, variables, base_path="")
    assert not report["missing"], f"unconverted layers: {report['missing'][:10]}"

    ours = np.asarray(bb.apply(variables, x, train=False))
    theirs = truncated.predict(x, verbose=0)
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, atol=atol)


@pytest.mark.parametrize("os_,cut", [(8, "block_5_add"), (16, "block_12_add")])
def test_mobilenetv2_parity(os_, cut):
    from tensorflow.keras.applications import MobileNetV2

    convert_and_compare("mobilenetv2", MobileNetV2, cut, os_, 96, atol=1e-4)


@pytest.mark.parametrize("os_,cut", [(8, "block4_sepconv2_bn"), (16, "block13_sepconv2_bn")])
def test_xception_parity(os_, cut):
    from tensorflow.keras.applications import Xception

    convert_and_compare("xception", Xception, cut, os_, 96, atol=1e-4)


@pytest.mark.parametrize("os_,cut", [(8, "pool3_conv"), (16, "pool4_conv")])
def test_densenet121_parity(os_, cut):
    from tensorflow.keras.applications import DenseNet121

    convert_and_compare("densenet121", DenseNet121, cut, os_, 96, atol=1e-4)


@pytest.mark.parametrize("os_,cut", [(8, "block3b_add"), (16, "block5c_add")])
def test_efficientnetb0_parity(os_, cut):
    from tensorflow.keras.applications import EfficientNetB0

    convert_and_compare("efficientnetb0", EfficientNetB0, cut, os_, 96, atol=1e-3)


@pytest.mark.parametrize("os_,adjust_bn", [(8, "adjust_bn_reduce_4"), (16, "adjust_bn_reduce_8")])
def test_nasnetmobile_parity(os_, adjust_bn):
    """The trickiest cut: activation_73/_132 in the reference (:675-693)
    are process-global auto-numbered names; structurally they are the ReLU
    fed by adjust_bn_reduce_4/_8 — located that way here (the auto counter
    depends on how many models were built in the process)."""
    from tensorflow import keras
    from tensorflow.keras.applications import NASNetMobile

    from deeplabv3plus_keras_tpu.models.backbones import get_backbone
    from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone

    full = NASNetMobile(input_shape=(96, 96, 3), include_top=False, weights=None)
    cut_layer = None
    for layer in full.layers:
        if not layer.name.startswith("activation"):
            continue
        src = layer.input._keras_history[0]
        if getattr(src, "name", None) == adjust_bn:
            cut_layer = layer
            break
    assert cut_layer is not None, f"no ReLU fed by {adjust_bn}"
    truncated = keras.Model(full.inputs, cut_layer.output)

    bb = get_backbone("nasnetmobile", os_)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, report = convert_keras_backbone(full, variables, base_path="")
    assert not report["missing"], f"unconverted: {report['missing'][:10]}"
    ours = np.asarray(bb.apply(variables, x, train=False))
    theirs = truncated.predict(x, verbose=0)
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("os_,cut", [(8, "block3c_add"), (16, "block5d_add")])
def test_efficientnetb1_parity(os_, cut):
    """B1 exercises the depth-scaling (ceil(1.1·r) repeats → the per-variant
    cut letters, reference :549-556)."""
    from tensorflow.keras.applications import EfficientNetB1

    convert_and_compare("efficientnetb1", EfficientNetB1, cut, os_, 96, atol=1e-3)


def test_densenet201_parity():
    from tensorflow.keras.applications import DenseNet201

    convert_and_compare("densenet201", DenseNet201, "pool4_conv", 16, 96, atol=1e-4)


@pytest.mark.parametrize("os_,adjust_bn", [(16, "adjust_bn_reduce_12")])
def test_nasnetlarge_parity(os_, adjust_bn):
    """NASNetLarge adds skip_reduction=True semantics (p bypasses the
    reduction cells) on top of the mobile wiring. Slow (~7 min on 1 CPU)."""
    from tensorflow import keras
    from tensorflow.keras.applications import NASNetLarge

    from deeplabv3plus_keras_tpu.models.backbones import get_backbone
    from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone

    full = NASNetLarge(input_shape=(96, 96, 3), include_top=False, weights=None)
    cut = None
    for layer in full.layers:
        if layer.name.startswith("activation"):
            src = layer.input._keras_history[0]
            if getattr(src, "name", None) == adjust_bn:
                cut = layer
                break
    assert cut is not None
    truncated = keras.Model(full.inputs, cut.output)
    bb = get_backbone("nasnetlarge", os_)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, report = convert_keras_backbone(full, variables, base_path="")
    assert not report["missing"]
    ours = np.asarray(bb.apply(variables, x, train=False))
    theirs = truncated.predict(x, verbose=0)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_h5_weight_loading_workflow(tmp_path):
    """The offline pretrained-weights workflow users follow: save Keras
    weights to .h5, rebuild + load + convert (utils.keras_weights.
    load_keras_h5_backbone)."""
    from tensorflow.keras.applications import MobileNetV2

    from deeplabv3plus_keras_tpu.models.backbones import get_backbone
    from deeplabv3plus_keras_tpu.utils.keras_weights import load_keras_h5_backbone

    src = MobileNetV2(input_shape=(96, 96, 3), include_top=False, weights=None)
    h5 = str(tmp_path / "mv2.weights.h5")
    src.save_weights(h5)

    bb = get_backbone("mobilenetv2", 16)
    x = np.random.default_rng(0).uniform(-1, 1, (1, 96, 96, 3)).astype(np.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, report = load_keras_h5_backbone(
        h5,
        lambda: MobileNetV2(input_shape=(96, 96, 3), include_top=False, weights=None),
        variables,
        base_path="",
    )
    assert not report["missing"]

    from tensorflow import keras

    truncated = keras.Model(src.inputs, src.get_layer("block_12_add").output)
    ours = np.asarray(bb.apply(variables, x, train=False))
    theirs = truncated.predict(x, verbose=0)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_reference_conf_json_runs_end_to_end():
    """The EXACT config file shipped with the reference (densenet121,
    224², boundary refinement, the 5-branch chained ASPP) constructs and
    runs through segment() — the strongest config-surface compatibility
    proof."""
    import jax.numpy as jnp

    from deeplabv3plus_keras_tpu import SemanticSegmentation
    from deeplabv3plus_keras_tpu.config import Config

    conf = Config.from_json(
        "/root/reference/bodhi/deeplabv3plus_keras/"
        "semantic_segmentation_deeplabv3plus_conf.json"
    )
    conf.model_loading = False
    ss = SemanticSegmentation(conf, work_dir=".")
    labels = ss.segment(jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert labels.shape == (1, 224, 224)
    assert labels.max() <= conf.nn_arch.num_classes - 1
