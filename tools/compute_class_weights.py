"""Offline class-imbalance weight computation CLI.

Equivalent of the reference's analysis-notebook procedure
(``cal_ss_class_imbalance_weights``, semantic_segmentation.py:365-407,
run in analysis/deeplabv3plus_keras_analysis.ipynb cell 8) that produced
the hard-coded ``ss_pw``/``ss_nw`` weights: per-class pixel frequencies
over the VOC-Aug combined list → pw = 1 − freq, nw = freq.

Usage:
    python tools/compute_class_weights.py <resource_path> [num_classes] [out.npz]

Prints pw/nw as JSON; with an out.npz argument also writes the arrays in
the format the ``class_weights_npz`` config key loads.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    resource_path = sys.argv[1]
    num_classes = int(sys.argv[2]) if len(sys.argv) > 2 else 21

    from deeplabv3plus_keras_tpu.train import compute_class_balance_weights

    sets = os.path.join(
        resource_path, "VOCdevkit", "VOC2012", "ImageSets", "Segmentation"
    )
    lab_dir = os.path.join(resource_path, "VOCdevkit", "VOC2012", "SegmentationClassAug")
    with open(os.path.join(sets, "train_aug_val.txt")) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    paths = [os.path.join(lab_dir, n + ".png") for n in names]
    pw, nw = compute_class_balance_weights(paths, num_classes)
    print(json.dumps({"pos_weights": pw.tolist(), "neg_weights": nw.tolist()}))
    if len(sys.argv) > 3:
        import numpy as np

        np.savez(sys.argv[3], pw=pw, nw=nw)


if __name__ == "__main__":
    main()
