"""Native C++ fastloader: byte-parity with the PIL path, fallback behavior,
cache interplay.  Skipped entirely where the library cannot be built."""

import numpy as np
import pytest

from deeplabv3plus_keras_tpu import native
from deeplabv3plus_keras_tpu.data import (
    HostLoader,
    MODE_TEST,
    MODE_TRAIN,
    make_synthetic_voc,
    pascal_voc_2012,
)

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="fastloader not buildable"
)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_synthetic_voc(
        str(tmp_path_factory.mktemp("voc")), n_train=7, n_val=2, n_test=3,
        min_size=90, max_size=180,
    )


def _batches(specs, **kw):
    return list(HostLoader(specs, batch_size=3, canvas_size=192, workers=1, **kw))


def assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image_canvas"], y["image_canvas"])
        if x["label_canvas"] is not None:
            np.testing.assert_array_equal(x["label_canvas"], y["label_canvas"])
        np.testing.assert_array_equal(x["sizes"], y["sizes"])
        np.testing.assert_array_equal(x["valid"], y["valid"])
        assert x["names"] == y["names"]


def test_native_matches_pil_train(voc_root):
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    assert_batches_equal(
        _batches(specs, backend="native"), _batches(specs, backend="pil")
    )


def test_native_matches_pil_unlabeled(voc_root):
    specs = pascal_voc_2012(voc_root, MODE_TEST)
    assert_batches_equal(
        _batches(specs, backend="native", with_labels=False),
        _batches(specs, backend="pil", with_labels=False),
    )


def test_native_oversized_falls_back(voc_root, tmp_path):
    """Images larger than the canvas take the Python downscale path and
    still match the PIL loader exactly."""
    big_root = make_synthetic_voc(
        str(tmp_path / "big"), n_train=3, n_val=0, n_test=0,
        min_size=300, max_size=420,
    )
    specs = pascal_voc_2012(big_root, MODE_TRAIN)
    kw = dict(oversize_target=128, label_clamp=21)
    a = list(HostLoader(specs, 2, canvas_size=256, workers=1, backend="native", **kw))
    b = list(HostLoader(specs, 2, canvas_size=256, workers=1, backend="pil", **kw))
    assert_batches_equal(a, b)


def test_native_with_cache(voc_root):
    specs = pascal_voc_2012(voc_root, MODE_TRAIN)
    loader = HostLoader(
        specs, batch_size=3, canvas_size=192, workers=1,
        backend="native", cache=True,
    )
    e1, e2 = list(loader), list(loader)
    ref = _batches(specs, backend="pil")
    assert_batches_equal(e1, ref)
    assert_batches_equal(e2, ref)


def test_native_decode_error_surfaces(voc_root):
    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    specs = pascal_voc_2012(voc_root, MODE_TRAIN)[:1] + [
        SampleSpec(name="missing", image_path="/nonexistent/x.jpg", label_path=None)
    ]
    loader = HostLoader(specs, batch_size=2, canvas_size=192, backend="native")
    with pytest.raises(Exception):
        list(loader)


def test_native_threaded_stress_ordered_and_exact(tmp_path):
    """4 Python workers × the C thread pool × the RAM cache over 3 epochs:
    ordering and bytes must match the single-worker PIL loader (catches
    races in the GIL-free decode path and the cache)."""
    root = make_synthetic_voc(
        str(tmp_path / "voc"), n_train=23, n_val=0, n_test=0,
        min_size=60, max_size=150,
    )
    specs = pascal_voc_2012(root, MODE_TRAIN)
    stress = HostLoader(
        specs, batch_size=4, canvas_size=160, workers=4, max_queue_size=6,
        backend="native", cache=True,
    )
    ref = HostLoader(specs, batch_size=4, canvas_size=160, workers=1,
                     backend="pil")
    for _ in range(3):
        assert_batches_equal(list(stress), list(ref))


def test_interlaced_png_label_falls_back(tmp_path):
    """Adam7-interlaced label PNGs can't stream through png_read_row; the
    native loader must fall back per item and still match PIL exactly."""
    from PIL import Image

    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8)
    Image.fromarray(img).save(str(tmp_path / "a.jpg"))
    lab = rng.integers(0, 21, (60, 80)).astype(np.uint8)
    Image.fromarray(lab, mode="P").save(str(tmp_path / "a.png"), interlace=1)
    spec = SampleSpec(
        name="a", image_path=str(tmp_path / "a.jpg"),
        label_path=str(tmp_path / "a.png"),
    )
    a = list(HostLoader([spec], 1, canvas_size=128, workers=1, backend="native"))
    b = list(HostLoader([spec], 1, canvas_size=128, workers=1, backend="pil"))
    assert_batches_equal(a, b)


@pytest.mark.parametrize(
    "variant", ["gray_jpeg", "gray8", "rgb", "rgba", "p4", "g16"]
)
def test_format_matrix_native_matches_pil(tmp_path, variant):
    """Image/label format matrix: every variant must be byte-identical to
    the PIL path, whether decoded natively or via per-item fallback
    (grayscale JPEG, gray/RGB/RGBA/4-bit-palette label PNGs, and 16-bit
    gray labels where MSB≠LSB so strip-vs-cast semantics would differ)."""
    from PIL import Image

    from deeplabv3plus_keras_tpu.data.voc import SampleSpec

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (50, 70, 3)).astype(np.uint8)
    lab8 = rng.integers(0, 21, (50, 70)).astype(np.uint8)
    ip = str(tmp_path / "img.jpg")
    lp = str(tmp_path / "lab.png")
    Image.fromarray(img).save(ip)
    if variant == "gray_jpeg":
        Image.fromarray(img[..., 0]).save(ip)
        lp = None
    elif variant == "gray8":
        Image.fromarray(lab8).save(lp)
    elif variant == "rgb":
        Image.fromarray(np.stack([lab8] * 3, -1)).save(lp)
    elif variant == "rgba":
        a = np.full((50, 70), 255, np.uint8)
        Image.fromarray(np.dstack([np.stack([lab8] * 3, -1), a])).save(lp)
    elif variant == "p4":
        Image.fromarray((lab8 % 16), mode="P").save(lp, bits=4)
    elif variant == "g16":
        # high byte differs from low byte -> catches MSB-vs-LSB divergence
        lab16 = (lab8.astype(np.uint16) << 8) | rng.integers(
            0, 256, (50, 70)
        ).astype(np.uint16)
        im16 = Image.new("I;16", (70, 50))
        im16.frombytes(lab16.astype("<u2").tobytes())
        im16.save(lp)
    spec = SampleSpec(name="x", image_path=ip, label_path=lp)
    wl = lp is not None
    a = list(
        HostLoader([spec], 1, canvas_size=128, workers=1,
                   backend="native", with_labels=wl)
    )
    b = list(
        HostLoader([spec], 1, canvas_size=128, workers=1,
                   backend="pil", with_labels=wl)
    )
    assert_batches_equal(a, b)


def test_openimages_remap_native(tmp_path):
    from deeplabv3plus_keras_tpu.data.openimages import google_open_images_v5
    from deeplabv3plus_keras_tpu.data.synthetic import make_synthetic_openimages

    root = make_synthetic_openimages(str(tmp_path / "oi"), n_train=4, n_val=1)
    specs = google_open_images_v5(root, MODE_TRAIN)
    a = list(HostLoader(specs, 2, canvas_size=192, workers=1, backend="native"))
    b = list(HostLoader(specs, 2, canvas_size=192, workers=1, backend="pil"))
    assert_batches_equal(a, b)
