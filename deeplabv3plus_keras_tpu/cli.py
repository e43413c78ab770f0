"""CLI driver.

Mirror of the reference's ``main()`` (semantic_segmentation.py:1793-1845):
loads the JSON conf (default name in CWD, or a path argument), seeds RNGs
with the fixed 1024 (:1797-1802), dispatches on ``mode`` ∈ {train,
evaluate, test, convert_to_tf_lite}, and times each run.

Usage:
    python -m deeplabv3plus_keras_tpu.cli [conf.json]
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np

from .api import SemanticSegmentation
from .config import (
    MODE_CONVERT_TO_TF_LITE,
    MODE_EVALUATE,
    MODE_TEST,
    MODE_TRAIN,
)

DEFAULT_CONF = "semantic_segmentation_deeplabv3plus_conf.json"


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    conf_path = argv[0] if argv else DEFAULT_CONF

    # Fixed seed 1024 (reference :1797-1802 — a time-based seed line is
    # immediately overwritten there; only the fixed seed is meaningful).
    seed = 1024
    random.seed(seed)
    np.random.seed(seed)

    with open(conf_path) as f:
        conf = json.load(f)

    mode = conf.get("mode", MODE_TRAIN)
    ss = SemanticSegmentation(conf)

    start = time.time()
    if mode == MODE_TRAIN:
        ss.train()
    elif mode == MODE_EVALUATE:
        ss.evaluate(
            mode=conf.get("eval_data_mode", 1),
            result_saving=conf.get("eval_result_saving", False),
        )
    elif mode == MODE_TEST:
        ss.test()
    elif mode == MODE_CONVERT_TO_TF_LITE:
        ss.convert_to_tf_lite()
    else:
        raise ValueError(f"unknown mode {mode!r}")
    print(f"Elapsed time: {time.time() - start:.1f}s ({mode})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
