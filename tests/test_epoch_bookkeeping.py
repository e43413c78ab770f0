"""VOC-Aug-scale epoch bookkeeping dress rehearsal (VERDICT r2 item 6).

The reference's flagship run trains train_aug_val.txt = 12,031 names at
val_ratio 0.1, batch 6: split int(12031·0.9) = 10,827 train / 1,204 val
(semantic_segmentation.py:1464-1468), and writes hps['tr_step'] =
10827//6 = 1804, hps['val_step'] = 1204//6 = 200 (:1488-1501) — the
notebook's '1804 steps/epoch'.  The reference then fits with
steps_per_epoch=tr_step (floor), silently DROPPING the ragged tail batch
(:1000-1009); this framework instead processes the tail at full batch
shape with a validity mask, so its step counts are the ceilings 1805/201.

This suite pins the full-cardinality numbers without decoding 12k images:
the list files carry 12,031 names that cycle over 24 real image files, and
`cache_decoded` makes repeated decodes free.  One real train() epoch runs
at the flagship cardinality (tiny 32² geometry) and must land exactly
1,805 optimizer steps.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from deeplabv3plus_keras_tpu.data import (
    MODE_TRAIN,
    MODE_VAL,
    make_synthetic_voc,
    pascal_voc_2012_ext,
)

N_LIST = 12031  # lines in the reference's train_aug_val.txt
BATCH = 6
VAL_RATIO = 0.1
N_TRAIN_REF, N_VAL_REF = 10827, 1204  # int(12031·0.9) head / tail
TR_STEP_REF, VAL_STEP_REF = 1804, 200  # reference floor write-back
TR_STEP_OURS, VAL_STEP_OURS = 1805, 201  # ceil: masked ragged tail kept


@pytest.fixture(scope="module")
def aug_scale_root(tmp_path_factory):
    """A synthetic VOC root whose train_aug_val.txt has 12,031 entries
    cycling over 24 real JPEG/PNG pairs."""
    root = make_synthetic_voc(
        str(tmp_path_factory.mktemp("vocaug")), n_train=24, n_val=0,
        n_test=0, min_size=40, max_size=56,
    )
    sets = os.path.join(root, "VOCdevkit", "VOC2012", "ImageSets", "Segmentation")
    with open(os.path.join(sets, "train_aug_val.txt")) as f:
        real = [ln.strip() for ln in f if ln.strip()]
    assert len(real) == 24
    names = [real[i % len(real)] for i in range(N_LIST)]
    with open(os.path.join(sets, "train_aug_val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return root


def test_split_matches_reference_formula(aug_scale_root):
    tr = pascal_voc_2012_ext(aug_scale_root, MODE_TRAIN, VAL_RATIO)
    va = pascal_voc_2012_ext(aug_scale_root, MODE_VAL, VAL_RATIO)
    assert len(tr) == N_TRAIN_REF  # int(n·(1−r)), NOT n − int(n·r)
    assert len(va) == N_VAL_REF
    assert len(tr) + len(va) == N_LIST


def test_loader_steps_are_ceil_of_reference_floor(aug_scale_root):
    from deeplabv3plus_keras_tpu.data.pipeline import HostLoader

    tr = pascal_voc_2012_ext(aug_scale_root, MODE_TRAIN, VAL_RATIO)
    va = pascal_voc_2012_ext(aug_scale_root, MODE_VAL, VAL_RATIO)
    tr_steps = HostLoader(tr, batch_size=BATCH, workers=1).steps()
    va_steps = HostLoader(va, batch_size=BATCH, workers=1).steps()
    assert (len(tr) // BATCH, len(va) // BATCH) == (TR_STEP_REF, VAL_STEP_REF)
    assert (tr_steps, va_steps) == (TR_STEP_OURS, VAL_STEP_OURS)


def test_full_epoch_at_flagship_cardinality(aug_scale_root, tmp_path):
    """One real train() epoch over 10,827 specs: hps write-back and the
    optimizer step count must land exactly on the ceil bookkeeping."""
    from deeplabv3plus_keras_tpu.api import SemanticSegmentation

    conf = {
        "mode": "train", "resource_type": "pascal_voc_2012_ext",
        "resource_path": aug_scale_root, "model_loading": False,
        "multi_gpu": False, "num_gpus": 1, "prepro_device": 0,
        "base_model": "mobilenetv2", "workers": 2, "max_queue_size": 8,
        "cache_decoded": True,  # 24 unique files → decode cost is trivial
        "hps": {"lr": 0.001, "epochs": 1, "batch_size": BATCH,
                "val_ratio": VAL_RATIO, "weight_decay": 0.0},
        "nn_arch": {"boundary_refinement": False, "output_stride": 16,
                    "image_size": 32, "num_classes": 21,
                    "conv_rate_multiplier": 1, "reduction_size": 8,
                    "dropout_rate": 0.0, "concat_channels": 8,
                    "encoder_middle_conf": [
                        {"kernel": 1, "rate": [1, 1], "op": "conv",
                         "input": -1}]},
    }
    ss = SemanticSegmentation(conf, work_dir=str(tmp_path))
    hist = ss.train()
    assert ss.hps.tr_step == TR_STEP_OURS
    assert ss.hps.val_step == VAL_STEP_OURS
    assert int(ss.state.step) == TR_STEP_OURS  # one optimizer step per batch
    assert len(hist["loss"]) == 1 and np.isfinite(hist["loss"][0])
