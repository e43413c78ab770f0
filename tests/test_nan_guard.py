"""NaN guard: a diverged run fails loudly at epoch granularity (the hot
loop stays sync-free) instead of silently poisoning checkpoints — a
failure-detection capability the reference lacked entirely (SURVEY §5)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # builds the full model once

import jax.numpy as jnp


@pytest.fixture(scope="module")
def trained_api(tmp_path_factory):
    from deeplabv3plus_keras_tpu.api import SemanticSegmentation
    from deeplabv3plus_keras_tpu.data import make_synthetic_voc

    tmp = tmp_path_factory.mktemp("nanguard")
    root = make_synthetic_voc(str(tmp / "voc"), n_train=4, n_val=2)
    conf = {
        "mode": "train", "resource_type": "pascal_voc_2012_ext",
        "resource_path": root, "model_loading": False,
        "multi_gpu": False, "num_gpus": 1, "prepro_device": 0,
        "base_model": "mobilenetv2", "workers": 1,
        "hps": {"lr": 0.001, "epochs": 1, "batch_size": 2, "val_ratio": 0.5},
        "nn_arch": {"boundary_refinement": False, "output_stride": 16,
                    "image_size": 32, "num_classes": 21,
                    "conv_rate_multiplier": 1, "reduction_size": 8,
                    "dropout_rate": 0.0, "concat_channels": 8,
                    "encoder_middle_conf": [
                        {"kernel": 1, "rate": [1, 1], "op": "conv",
                         "input": -1}]},
    }
    return SemanticSegmentation(conf, work_dir=str(tmp)), tmp


def _poison(ss):
    real = ss._train_step

    def poisoned(state, batch, rng):
        state, metrics = real(state, batch, rng)
        return state, {"loss": jnp.float32(np.nan), "cm": metrics["cm"]}

    ss._train_step = poisoned
    return real


def test_nan_loss_raises_and_skips_checkpoint(trained_api):
    import os

    ss, tmp = trained_api
    real = _poison(ss)
    try:
        with pytest.raises(FloatingPointError, match="non-finite training loss"):
            ss.train()
        assert not os.path.isdir(
            os.path.join(str(tmp), "semantic_segmentation_deeplabv3plus", "state")
        )
    finally:
        ss._train_step = real


def test_nan_guard_can_be_disabled(trained_api):
    ss, _ = trained_api
    ss.conf.extra["nan_guard"] = False
    real = _poison(ss)
    try:
        hist = ss.train()  # completes; history carries the NaN honestly
        assert np.isnan(hist["loss"][0])
    finally:
        ss._train_step = real
        ss.conf.extra.pop("nan_guard")
