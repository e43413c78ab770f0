"""Full-API end-to-end training on the real TPU at 512²: synthetic VOC on
disk → threaded host decode → on-device preprocessing → sharded train steps
→ checkpoint → evaluate. The complete production path, on hardware.

python tools/tpu_e2e_train.py [workdir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_e2e"
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    from deeplabv3plus_keras_tpu import SemanticSegmentation
    from deeplabv3plus_keras_tpu.data import make_synthetic_voc

    make_synthetic_voc(
        os.path.join(workdir, "resource"),
        n_train=56,
        n_val=8,
        n_test=4,
        min_size=350,
        max_size=500,
    )
    conf = {
        "mode": "train",
        "resource_type": "pascal_voc_2012_ext",
        "resource_path": os.path.join(workdir, "resource"),
        "model_loading": False,
        "multi_gpu": False,
        "num_gpus": 1,
        "prepro_device": 0,
        "eval_data_mode": 1,
        "eval_result_saving": False,
        "base_model": "mobilenetv2",
        "max_queue_size": 8,
        "workers": 2,
        "metrics_log": os.path.join(workdir, "metrics.jsonl"),
        # decoded-sample RAM cache (epochs >= 2 skip image decode);
        # CACHE=0 to disable for A/B comparison.
        "cache_decoded": os.environ.get("CACHE", "1") == "1",
        # HBM-resident dataset (zero host->device bytes per epoch)
        "cache_device": os.environ.get("DEVCACHE", "0") == "1",
        "hps": {
            "dtype": "float32",
            "val_ratio": 0.125,
            "lr": 0.0003,
            "beta_1": 0.5,
            "beta_2": 0.99,
            "decay": 0.0,
            "epochs": 3,
            "batch_size": 8,
            "weight_decay": 0.00004,
            "bn_momentum": 0.9,
            "bn_scale": True,
            "reduce_lr_factor": 0.99,
        },
        "nn_arch": {
            "boundary_refinement": True,
            "output_stride": 16,
            "image_size": 512,
            "num_classes": 21,
            "conv_rate_multiplier": 1,
            "reduction_size": 256,
            "dropout_rate": 0.5,
            "concat_channels": 256,
            "encoder_middle_conf": [
                {"kernel": 3, "rate": [1, 1], "op": "conv", "input": -1},
                {"kernel": 3, "rate": [18, 15], "op": "conv", "input": 0},
                {"kernel": 3, "rate": [6, 3], "op": "conv", "input": 1},
                {"kernel": 3, "rate": [1, 1], "op": "conv", "input": 0},
                {"kernel": 3, "rate": [6, 21], "op": "conv", "input": 0},
            ],
        },
    }
    t0 = time.time()
    ss = SemanticSegmentation(conf, work_dir=workdir)
    history = ss.train()
    print(f"train done in {time.time()-t0:.1f}s; history: {history}", flush=True)
    m = ss.evaluate(mode=1)
    print(f"final val mIoU {m.result():.4f}", flush=True)


if __name__ == "__main__":
    main()
