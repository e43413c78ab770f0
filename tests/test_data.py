"""Data-layer tests: VOC sources, ext split semantics, loader ordering /
ragged batch, Open Images CSV source."""

import numpy as np
import pytest

from deeplabv3plus_keras_tpu.data import (
    HostLoader,
    MODE_TEST,
    MODE_TRAIN,
    MODE_VAL,
    make_synthetic_voc,
    pascal_voc_2012,
    pascal_voc_2012_ext,
)
from deeplabv3plus_keras_tpu.data.synthetic import make_synthetic_openimages


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_synthetic_voc(
        str(tmp_path_factory.mktemp("voc")), n_train=5, n_val=3, n_test=2
    )


@pytest.fixture(scope="module")
def oi_root(tmp_path_factory):
    return make_synthetic_openimages(
        str(tmp_path_factory.mktemp("oi")), n_train=6, n_val=2
    )


def test_voc_sources(voc_root):
    assert len(pascal_voc_2012(voc_root, MODE_TRAIN)) == 5
    assert len(pascal_voc_2012(voc_root, MODE_VAL)) == 3
    test = pascal_voc_2012(voc_root, MODE_TEST)
    assert len(test) == 2 and test[0].label_path is None


def test_ext_split_head_tail_unshuffled(voc_root):
    """Ext semantics (reference :1463-1468): train = head slice, val =
    tail slice of ONE combined list, no shuffle."""
    tr = pascal_voc_2012_ext(voc_root, MODE_TRAIN, val_ratio=0.25)
    va = pascal_voc_2012_ext(voc_root, MODE_VAL, val_ratio=0.25)
    assert len(tr) == 6 and len(va) == 2  # 8 names, val = int(8*.25)
    all_names = [s.name for s in tr] + [s.name for s in va]
    assert all_names == sorted(all_names, key=all_names.index)  # order kept
    assert {s.name for s in tr}.isdisjoint({s.name for s in va})


def test_loader_ragged_last_batch_and_order(voc_root):
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)  # 5 samples
    loader = HostLoader(specs, batch_size=2, canvas_size=128, workers=2)
    batches = list(loader)
    assert len(batches) == 3 == loader.steps()
    assert [b["valid"].sum() for b in batches] == [2, 2, 1]
    # ordered delivery despite threaded workers
    names = [n for b in batches for n, v in zip(b["names"], b["valid"]) if v]
    assert names == [s.name for s in specs]


def test_loader_shuffle_is_deterministic_per_epoch(voc_root):
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    l1 = HostLoader(specs, batch_size=2, canvas_size=128, shuffle=True, seed=7)
    l2 = HostLoader(specs, batch_size=2, canvas_size=128, shuffle=True, seed=7)
    n1 = [n for b in l1 for n in b["names"]]
    n2 = [n for b in l2 for n in b["names"]]
    assert n1 == n2
    n1b = [n for b in l1 for n in b["names"]]  # epoch 2 differs
    assert n1 != n1b


def test_loader_set_epoch_reproduces_resumed_order(voc_root):
    """set_epoch(k) on a fresh loader reproduces exactly the shuffle order
    a continuously-run loader had at epoch k — the property the train
    loop's 'resume' continuation relies on."""
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    cont = HostLoader(specs, batch_size=2, canvas_size=128, shuffle=True, seed=7)
    list(cont)  # epoch 0
    epoch1 = [n for b in cont for n in b["names"]]

    resumed = HostLoader(specs, batch_size=2, canvas_size=128, shuffle=True, seed=7)
    resumed.set_epoch(1)
    assert [n for b in resumed for n in b["names"]] == epoch1


def test_openimages_source_and_remap(oi_root):
    from deeplabv3plus_keras_tpu.data.openimages import (
        google_open_images_v5,
        load_class_maps,
    )
    from deeplabv3plus_keras_tpu.data.pipeline import load_sample

    _, _, ic2in, sc2in = load_class_maps(oi_root)
    assert len(sc2in) == 7  # Airplane filtered out
    assert sc2in["Person"] == 1  # file order, 1-based

    specs = google_open_images_v5(oi_root, MODE_TRAIN)
    assert 0 < len(specs) <= 6  # rows with out-of-subset classes dropped
    img, lab = load_sample(specs[0])
    assert img.ndim == 3
    vals = set(np.unique(lab))
    assert vals <= {0, specs[0].label_remap_value}  # 1 remapped to class idx


def test_openimages_test_mode_has_no_labels(oi_root):
    from deeplabv3plus_keras_tpu.data.openimages import google_open_images_v5

    specs = google_open_images_v5(oi_root, MODE_TEST)
    assert all(s.label_path is None for s in specs)


def test_abandoned_iteration_does_not_leak_workers(voc_root):
    """A consumer that stops mid-epoch (error, preemption, early break)
    must not leave prefetch workers parked in inflight.acquire forever."""
    import gc
    import threading
    import time

    def worker_count():
        return sum(
            1 for t in threading.enumerate() if t.name == "hostloader-worker"
        )

    base = worker_count()
    specs = pascal_voc_2012(voc_root, MODE_TRAIN) * 8  # 40 samples
    loader = HostLoader(
        specs, batch_size=2, canvas_size=128, workers=3, max_queue_size=2,
        backend="pil",
    )
    it = iter(loader)
    next(it)  # start the pool, then abandon
    it.close()
    del it
    gc.collect()
    deadline = time.time() + 5
    while worker_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert worker_count() == base


def test_mismatched_label_size_raises_both_backends(voc_root, tmp_path):
    """A label PNG whose dimensions differ from its image must fail loudly
    on BOTH backends (the native loader falls back; silently cropping
    would train on misaligned labels)."""
    from PIL import Image

    from deeplabv3plus_keras_tpu import native
    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.uniform(0, 255, (100, 80, 3)).astype(np.uint8)
    ).save(str(tmp_path / "img.jpg"))
    Image.fromarray(
        rng.integers(0, 21, (80, 100)).astype(np.uint8)  # transposed dims
    ).save(str(tmp_path / "lab.png"))
    spec = SampleSpec(
        name="bad", image_path=str(tmp_path / "img.jpg"),
        label_path=str(tmp_path / "lab.png"),
    )
    backends = ["pil"] + (["native"] if native.native_available() else [])
    for backend in backends:
        loader = HostLoader(
            [spec], batch_size=1, canvas_size=128, workers=1, backend=backend
        )
        with pytest.raises(Exception):
            list(loader)


def test_loader_surfaces_decode_errors(voc_root):
    """A worker hitting an unreadable file must raise in the consumer, not
    hang or silently skip (the reference's enqueuer semantics)."""
    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    specs = pascal_voc_2012(voc_root, MODE_TRAIN)[:2]
    specs.append(
        SampleSpec(name="missing", image_path="/nonexistent/x.jpg", label_path=None)
    )
    loader = HostLoader(specs, batch_size=2, canvas_size=128, workers=2)
    with pytest.raises(Exception):
        list(loader)


def test_loader_cache_identical_and_skips_decode(voc_root, monkeypatch):
    """cache=True: epoch-2 batches byte-identical to the uncached loader's
    and no further load_sample calls after the first epoch."""
    from deeplabv3plus_keras_tpu.data import pipeline as pipe

    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    calls = {"n": 0}
    real = pipe.load_sample

    def counting(spec):
        calls["n"] += 1
        return real(spec)

    monkeypatch.setattr(pipe, "load_sample", counting)
    cached = HostLoader(
        specs, batch_size=2, canvas_size=128, workers=1, cache=True, backend="pil"
    )
    plain = HostLoader(specs, batch_size=2, canvas_size=128, workers=1, backend="pil")
    e1 = list(cached)
    assert calls["n"] == len(specs)
    e2 = list(cached)  # epoch 2: all hits
    assert calls["n"] == len(specs)
    ref = list(plain)
    for a, b, r in zip(e1, e2, ref):
        np.testing.assert_array_equal(a["image_canvas"], r["image_canvas"])
        np.testing.assert_array_equal(b["image_canvas"], r["image_canvas"])
        np.testing.assert_array_equal(b["label_canvas"], r["label_canvas"])
        np.testing.assert_array_equal(b["sizes"], r["sizes"])


def test_compute_class_weights_tool(voc_root):
    """tools/compute_class_weights.py path: weight computation over the
    synthetic VOC labels (reference cal_ss_class_imbalance_weights)."""
    import os

    from deeplabv3plus_keras_tpu.train import compute_class_balance_weights

    lab_dir = os.path.join(voc_root, "VOCdevkit", "VOC2012", "SegmentationClassAug")
    paths = [os.path.join(lab_dir, f) for f in sorted(os.listdir(lab_dir))]
    pw, nw = compute_class_balance_weights(paths, 21)
    np.testing.assert_allclose(pw + nw, 1.0, atol=1e-6)
    assert nw.sum() > 0  # frequencies observed


def test_resolve_class_weights_npz(tmp_path):
    from deeplabv3plus_keras_tpu.config import Config
    from deeplabv3plus_keras_tpu.parallel.step import (
        default_class_weights,
        resolve_class_weights,
    )

    conf = Config()
    conf.nn_arch.num_classes = 7
    assert resolve_class_weights(conf) is None
    d = default_class_weights(7)
    assert (d[0] == 1).all() and (d[1] == 0).all()  # non-VOC fallback

    pw = np.linspace(0.1, 0.7, 7).astype(np.float32)
    nw = (1 - pw).astype(np.float32)
    path = str(tmp_path / "w.npz")
    np.savez(path, pw=pw, nw=nw)
    conf.extra["class_weights_npz"] = path
    got = resolve_class_weights(conf)
    np.testing.assert_array_equal(got[0], pw)
    np.testing.assert_array_equal(got[1], nw)

    conf.nn_arch.num_classes = 21  # shape mismatch must raise
    with pytest.raises(ValueError, match="class_weights_npz"):
        resolve_class_weights(conf)


def test_config_roundtrip_preserves_extra_keys():
    from deeplabv3plus_keras_tpu.config import Config

    d = {"mode": "train", "base_model": "xception", "my_custom_key": {"a": 1},
         "sparse_labels": True,
         "hps": {"lr": 0.01}, "nn_arch": {"output_stride": 8,
         "encoder_middle_conf": [{"kernel": 1, "op": "conv", "input": -1}]}}
    c = Config.from_dict(d)
    out = c.to_dict()
    assert out["my_custom_key"] == {"a": 1}
    assert out["sparse_labels"] is True
    assert out["base_model"] == "xception"
    assert out["hps"]["lr"] == 0.01
    assert out["nn_arch"]["output_stride"] == 8


def test_config_explicit_extra_dict_merges_flat():
    """{"extra": {...}} must merge into conf.extra (not nest silently);
    flat top-level unknown keys win on collision."""
    from deeplabv3plus_keras_tpu.config import Config

    d = {"mode": "train", "extra": {"eval_per_class_iou": True, "augment": False},
         "augment": True,
         "nn_arch": {"encoder_middle_conf": [{"kernel": 1, "op": "conv", "input": -1}]}}
    c = Config.from_dict(d)
    assert c.extra.get("eval_per_class_iou") is True
    assert c.extra.get("augment") is True  # flat key wins
    assert "extra" not in c.extra
    # round-trip re-parses identically (extra keys emit flat)
    c2 = Config.from_dict(c.to_dict())
    assert c2.extra == c.extra


def test_loader_prefetch_pool_never_wedges_under_credit_contention(voc_root):
    """Starvation regression (pipeline.py worker): with more workers than
    inflight credits, the old dequeue-then-acquire order let a worker
    holding the OLDEST batch lose the (unfair, 0.1 s-poll-scrambled)
    semaphore race to workers holding later batches, wedging the in-order
    consumer forever — observed as a full-suite hang in the 1805-batch
    epoch-bookkeeping test.  Credit-first acquisition must drain a long
    4-worker/2-credit epoch with >0.1 s jittered assembly latency (the
    poll-timeout scrambling is what exposes the unfairness; this config
    wedged the old code in 4/4 simulated runs by batch ~30)."""
    import threading
    import time

    specs = pascal_voc_2012(voc_root, MODE_TRAIN) * 12  # one 60-batch epoch
    loader = HostLoader(
        specs, batch_size=1, canvas_size=64, workers=4, max_queue_size=2,
        cache=True, backend="pil",
    )
    orig = loader._assemble
    jitter = np.random.default_rng(0)

    def slow_assemble(b):
        time.sleep(float(jitter.uniform(0, 0.15)))
        return orig(b)

    loader._assemble = slow_assemble
    done = threading.Event()
    names = []

    def consume():
        for batch in loader:
            names.append(batch["names"][0])
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=120), "prefetch pool wedged (credit starvation)"
    assert names == [s.name for s in specs]  # ordered delivery intact
