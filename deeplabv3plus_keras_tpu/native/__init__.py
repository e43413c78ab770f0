"""ctypes bindings for the native batch loader (fastloader.cpp).

The shared library is built on demand from the single C++ source with the
system toolchain (build.py); when g++ or libjpeg/libpng are unavailable the
pipeline silently stays on the PIL path — the native loader is a pure
accelerator, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

FL_OK = 0
FL_OVERSIZED = 1
FL_FALLBACK = 2

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load_library():
    from .build import build_fastloader

    path = build_fastloader()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fl_assemble_batch.restype = ctypes.c_int
    lib.fl_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # img_paths
        ctypes.POINTER(ctypes.c_char_p),  # lab_paths
        ctypes.POINTER(ctypes.c_int32),   # lab_remap
        ctypes.c_int,                     # n
        ctypes.c_int,                     # canvas_h
        ctypes.c_int,                     # canvas_w
        ctypes.c_void_p,                  # img_canvas
        ctypes.c_void_p,                  # lab_canvas
        ctypes.POINTER(ctypes.c_int32),   # sizes
        ctypes.POINTER(ctypes.c_int32),   # status
        ctypes.c_int,                     # nthreads
    ]
    lib.fl_abi_version.restype = ctypes.c_int
    if lib.fl_abi_version() != 1:
        return None
    return lib


def get_lib():
    """The loaded fastloader library, or None if it cannot be built."""
    global _lib, _lib_tried
    with _lock:
        if not _lib_tried:
            _lib_tried = True
            try:
                lib = _load_library()
                if lib is not None and not _self_check(lib):
                    lib = None  # byte-parity with PIL not reproduced
                _lib = lib
            except Exception:
                _lib = None
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def _self_check(lib) -> bool:
    """One-time runtime byte-parity check vs PIL (ADVICE r2): decode a
    generated JPEG + PNG pair through both paths and compare bytes.  The
    'bit-identical to PIL' property depends on the system libjpeg matching
    PIL's bundled libjpeg-turbo — IJG libjpeg 9.x differs in upsampling /
    color conversion — so a machine where it doesn't hold silently falls
    back to the PIL path instead of silently diverging numerically.
    """
    import collections
    import tempfile

    try:
        from PIL import Image
    except Exception:
        return True  # no PIL → nothing to diverge from

    Spec = collections.namedtuple(
        "Spec", "image_path label_path label_remap_value"
    )
    rng = np.random.default_rng(1024)
    # gradient + noise exercises chroma subsampling / upsampling paths
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack(
        [(x * 4) % 256, (y * 5) % 256, rng.integers(0, 256, (48, 64))],
        axis=-1,
    ).astype(np.uint8)
    lab = rng.integers(0, 32, (48, 64)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as td:
        jpg = os.path.join(td, "c.jpg")
        png = os.path.join(td, "c.png")
        Image.fromarray(img).save(jpg, quality=85)
        Image.fromarray(lab, mode="L").save(png)
        golden_img = np.asarray(Image.open(jpg).convert("RGB"), np.uint8)
        golden_lab = np.asarray(Image.open(png), np.uint8)

        img_canvas = np.zeros((1, 64, 64, 3), np.uint8)
        lab_canvas = np.zeros((1, 64, 64), np.uint8)
        sizes = np.zeros((1, 2), np.int32)
        status = _assemble_raw(
            lib, [Spec(jpg, png, None)], img_canvas, lab_canvas, sizes,
            nthreads=1,
        )
        if status[0] != FL_OK or tuple(sizes[0]) != golden_img.shape[:2]:
            return False
        h, w = golden_img.shape[:2]
        return bool(
            np.array_equal(img_canvas[0, :h, :w], golden_img)
            and np.array_equal(lab_canvas[0, :h, :w], golden_lab)
        )


def assemble_batch(
    specs,
    img_canvas: np.ndarray,
    lab_canvas: np.ndarray | None,
    sizes: np.ndarray,
    nthreads: int = 0,
) -> np.ndarray:
    """Decode ``specs`` into pre-zeroed canvases in one GIL-free C call.

    img_canvas: (n, CH, CW, 3) uint8 C-contiguous; lab_canvas: (n, CH, CW)
    uint8 or None; sizes: (n, 2) int32 (written).  Returns the per-item
    status vector; entries != FL_OK were NOT decoded (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastloader unavailable")
    return _assemble_raw(lib, specs, img_canvas, lab_canvas, sizes, nthreads)


def _assemble_raw(lib, specs, img_canvas, lab_canvas, sizes, nthreads=0):
    n = len(specs)
    assert img_canvas.flags.c_contiguous and img_canvas.dtype == np.uint8
    img_paths = (ctypes.c_char_p * n)(
        *[s.image_path.encode() for s in specs]
    )
    with_labels = lab_canvas is not None
    lab_paths = (ctypes.c_char_p * n)(
        *[
            (s.label_path.encode() if (with_labels and s.label_path) else None)
            for s in specs
        ]
    )
    remap = (ctypes.c_int32 * n)(
        *[
            (s.label_remap_value if s.label_remap_value is not None else -1)
            for s in specs
        ]
    )
    status = np.zeros((n,), np.int32)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    lib.fl_assemble_batch(
        img_paths,
        lab_paths,
        remap,
        n,
        img_canvas.shape[1],
        img_canvas.shape[2],
        img_canvas.ctypes.data_as(ctypes.c_void_p),
        lab_canvas.ctypes.data_as(ctypes.c_void_p) if with_labels else None,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nthreads,
    )
    return status
