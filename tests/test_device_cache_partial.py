"""cache_device HBM-fit degradation (VERDICT r2 weak item 3): a dataset
bigger than the HBM budget caches a prefix and streams the rest through
the host pipeline — never an XLA OOM — with every sample still seen
exactly once per epoch."""

import numpy as np
import pytest

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
        str(tmp_path_factory.mktemp("voc")), n_train=7, n_val=0, n_test=0,
        min_size=40, max_size=64,
    )


def _loader(voc_root, **over):
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    kw = dict(batch_size=3, canvas_size=64, workers=1, shuffle=True, seed=5)
    kw.update(over)
    return HostLoader(specs, **kw)


BPS = 64 * 64 * 4 + 8  # canvas² × (3 img + 1 label) + sizes


def _epoch_names(src, with_labels=True):
    names, n_batches = [], 0
    for b in device_batches(src, 64, 21, with_labels, one_hot_labels=True):
        v = np.asarray(b["valid"]).astype(bool)
        names += [n for n, ok in zip(b["names"], v) if ok]
        assert np.asarray(b["image"]).shape == (3, 64, 64, 3)
        if with_labels:
            assert np.asarray(b["label"]).shape == (3, 64, 64, 21)
        n_batches += 1
    return names, n_batches


def test_partial_cache_streams_remainder(voc_root, capsys):
    ds = DeviceDataset(_loader(voc_root), max_bytes=4 * BPS)  # 4 of 7 fit
    assert "cache_device: HBM budget fits 4/7 samples" in capsys.readouterr().out
    assert ds.n == 4 and ds.residual_loader is not None
    assert len(ds.residual_loader.specs) == 3
    assert ds.steps() == 2 + 1  # ceil(4/3) cached + ceil(3/3) streamed

    all_specs = [s.name for s in pascal_voc_2012(voc_root, MODE_TRAIN)]
    for _ in range(2):  # two epochs: exactly-once coverage each
        names, n_batches = _epoch_names(ds)
        assert sorted(names) == sorted(all_specs)
        assert n_batches == ds.steps()


def test_partial_cache_epochs_shuffle_both_parts(voc_root):
    ds = DeviceDataset(_loader(voc_root), max_bytes=4 * BPS)
    e1, _ = _epoch_names(ds)
    e2, _ = _epoch_names(ds)
    assert sorted(e1) == sorted(e2) and e1 != e2  # reshuffled, same cover


def test_zero_budget_degrades_to_host_streaming(voc_root, capsys):
    ds = DeviceDataset(_loader(voc_root), max_bytes=0, residual_cache=True)
    assert "fits 0/7" in capsys.readouterr().out
    assert ds.n == 0 and len(ds.residual_loader.specs) == 7
    assert ds.residual_loader.cache  # cache_decoded fallback semantics
    names, _ = _epoch_names(ds)
    assert len(names) == 7


def test_full_budget_unchanged(voc_root):
    full = DeviceDataset(_loader(voc_root))  # no limit on CPU (no stats)
    assert full.n == 7 and full.residual_loader is None
    assert full.steps() == 3


def test_partial_cache_sharded_mesh(voc_root):
    """Sharded over 'data': K rounds down to a shard multiple, residual
    streams; every sample exactly once per epoch."""
    from deeplabv3plus_keras_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2)
    # budget per device = 3 samples → K=6 → rounded to 6 (mult of 2)
    ds = DeviceDataset(
        _loader(voc_root, batch_size=2), mesh=mesh, max_bytes=3 * BPS
    )
    assert ds.n == 6 and len(ds.residual_loader.specs) == 1
    all_specs = [s.name for s in pascal_voc_2012(voc_root, MODE_TRAIN)]
    names, n_batches = [], 0
    for b in device_batches(ds, 64, 21, True, one_hot_labels=True):
        v = np.asarray(b["valid"]).astype(bool)
        names += [n for n, ok in zip(b["names"], v) if ok]
        n_batches += 1
    assert sorted(names) == sorted(all_specs)
    assert n_batches == ds.steps() == 3 + 1


def test_api_wires_max_bytes_through(tmp_path, capsys):
    """End-to-end through SemanticSegmentation: an oversized synthetic
    dataset with a tiny cache_device_max_bytes trains without error and
    logs the degradation."""
    pytest.importorskip("PIL")
    from deeplabv3plus_keras_tpu.api import SemanticSegmentation

    root = make_synthetic_voc(
        str(tmp_path / "voc"), n_train=6, n_val=2, min_size=40, max_size=60
    )
    conf = {
        "mode": "train", "resource_type": "pascal_voc_2012_ext",
        "resource_path": root, "model_loading": False,
        "multi_gpu": False, "num_gpus": 1, "prepro_device": 0,
        "base_model": "mobilenetv2", "workers": 1,
        "cache_device": True,
        "cache_device_max_bytes": 3 * (512 * 512 * 4 + 8),
        "hps": {"lr": 0.001, "epochs": 1, "batch_size": 2, "val_ratio": 0.25,
                "dropout_rate": 0.0},
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
    out = capsys.readouterr().out
    assert "cache_device: HBM budget fits" in out
    assert len(hist["loss"]) == 1 and np.isfinite(hist["loss"][0])


test_api_wires_max_bytes_through = pytest.mark.slow(test_api_wires_max_bytes_through)
