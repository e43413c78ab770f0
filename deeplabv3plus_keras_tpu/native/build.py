"""On-demand build of the fastloader shared library.

The .so is compiled once from fastloader.cpp into a user cache directory
(keyed by a source hash, so edits rebuild automatically) and reused across
processes.  Returns None when no toolchain or headers are present — callers
treat that as "native backend unavailable".
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastloader.cpp")


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "deeplabv3plus_keras_tpu")


def build_fastloader() -> str | None:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = _cache_dir()
    out = os.path.join(out_dir, f"_fastloader_{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        _SRC, "-o", tmp, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, out)  # atomic vs concurrent builders
        return out
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None
