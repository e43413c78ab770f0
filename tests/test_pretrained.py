"""Pretrained backbone weights reachable from the public config/API.

The reference always fine-tunes from keras.applications ImageNet weights
(semantic_segmentation.py:494-771); here the extra config key
``backbone_weights`` routes an .h5 file (or "imagenet") through the parity-
tested converter into ``SemanticSegmentation``'s initial state.  Needs TF
to build the Keras source → marked parity.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def h5_and_ref(tmp_path_factory):
    """A random-weight Keras MobileNetV2 saved to .h5 (the offline
    pretrained-weights artifact a user supplies)."""
    from tensorflow.keras.applications import MobileNetV2

    tmp = tmp_path_factory.mktemp("weights")
    src = MobileNetV2(input_shape=(64, 64, 3), include_top=False, weights=None)
    h5 = str(tmp / "mv2.weights.h5")
    src.save_weights(h5)
    first_kernel = np.asarray(src.get_layer("Conv1").get_weights()[0])
    return h5, first_kernel


def test_backbone_weights_config_key_reaches_state(tmp_path, h5_and_ref):
    """SemanticSegmentation built with backbone_weights must start from the
    converted Keras weights, then train an epoch through the public API."""
    import sys

    sys.path.insert(0, "tests")
    from test_end_to_end import small_conf_dict

    from deeplabv3plus_keras_tpu import SemanticSegmentation
    from deeplabv3plus_keras_tpu.data import make_synthetic_voc

    h5, first_kernel = h5_and_ref
    make_synthetic_voc(str(tmp_path / "resource"), n_train=2, n_val=2, n_test=1)
    conf = small_conf_dict(tmp_path)
    conf["backbone_weights"] = h5
    ss = SemanticSegmentation(conf, work_dir=str(tmp_path))
    got = np.asarray(ss.state.params["base"]["Conv1"]["kernel"])
    np.testing.assert_array_equal(got, first_kernel)

    history = ss.train()
    assert np.isfinite(history["loss"][0])
    # training moved the pretrained weights
    after = np.asarray(ss.state.params["base"]["Conv1"]["kernel"])
    assert not np.array_equal(after, first_kernel)


def test_missing_layers_raise(tmp_path, h5_and_ref):
    """A Keras source that can't cover the flax backbone must fail loudly,
    not train half-random."""
    import jax

    from deeplabv3plus_keras_tpu.config import Config, MiddleOp
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.utils.pretrained import load_pretrained_backbone

    h5, _ = h5_and_ref
    conf = Config()
    conf.base_model = "xception"  # wrong architecture for the mv2 .h5
    conf.nn_arch.image_size = 64
    conf.nn_arch.encoder_middle_conf = [MiddleOp(op="conv", kernel=1)]
    conf.extra["backbone_weights"] = h5
    _, variables = init_model(conf, jax.random.PRNGKey(0))
    with pytest.raises(Exception):
        load_pretrained_backbone(conf, variables)


def test_no_key_is_noop():
    import jax

    from deeplabv3plus_keras_tpu.config import Config, MiddleOp
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.utils.pretrained import load_pretrained_backbone

    conf = Config()
    conf.nn_arch.image_size = 64
    conf.nn_arch.encoder_middle_conf = [MiddleOp(op="conv", kernel=1)]
    _, variables = init_model(conf, jax.random.PRNGKey(0))
    out, report = load_pretrained_backbone(conf, variables)
    assert report is None and out is variables
