"""Preemption safety: SIGTERM during train() saves a restorable checkpoint
and exits cleanly (the TPU-pod preemption contract; the reference's only
resilience was manual best-checkpoint resume)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # compile-heavy subprocess on the 1-CPU host

CHILD = r"""
import json, os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")

from deeplabv3plus_keras_tpu import SemanticSegmentation
from deeplabv3plus_keras_tpu.data import make_synthetic_voc

workdir = sys.argv[1]
make_synthetic_voc(os.path.join(workdir, "resource"), n_train=4, n_val=2, n_test=0)
with open(os.path.join(workdir, "conf.json")) as f:
    conf = json.load(f)
ss = SemanticSegmentation(conf, work_dir=workdir)
ss.train()
print("TRAIN_RETURNED", flush=True)
"""


def make_conf(workdir, epochs=1000, model_loading=False):
    return {
        "mode": "train",
        "resource_type": "pascal_voc_2012_ext",
        "resource_path": os.path.join(workdir, "resource"),
        "model_loading": model_loading, "multi_gpu": False, "num_gpus": 1,
        "prepro_device": 0, "eval_data_mode": 1, "eval_result_saving": False,
        "base_model": "mobilenetv2", "max_queue_size": 4, "workers": 1,
        "metrics_log": os.path.join(workdir, "metrics.jsonl"),
        "hps": {"dtype": "float32", "val_ratio": 0.34, "lr": 0.001,
                "beta_1": 0.5, "beta_2": 0.99, "decay": 0.0, "epochs": epochs,
                "batch_size": 2, "weight_decay": 0.00004, "bn_momentum": 0.9,
                "bn_scale": True, "reduce_lr_factor": 0.99},
        "nn_arch": {"boundary_refinement": False, "output_stride": 16,
                    "image_size": 64, "num_classes": 21,
                    "conv_rate_multiplier": 1, "reduction_size": 16,
                    "dropout_rate": 0.5, "concat_channels": 16,
                    "encoder_middle_conf": [
                        {"kernel": 1, "rate": [1, 1], "op": "conv",
                         "input": -1}]},
    }


def test_sigterm_saves_restorable_checkpoint(tmp_path):
    workdir = str(tmp_path)
    with open(os.path.join(workdir, "conf.json"), "w") as f:
        json.dump(make_conf(workdir), f)
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    proc = subprocess.Popen(
        [sys.executable, "-u", str(script), workdir],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    lines = []
    try:
        # wait until the epoch loop is demonstrably running (an epoch line),
        # then preempt mid-training.
        deadline = time.time() + 900
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("epoch 2/"):
                proc.send_signal(signal.SIGTERM)
                break
            assert time.time() < deadline, "child never reached epoch 2"
        out, _ = proc.communicate(timeout=600)
        lines.append(out)
    finally:
        if proc.poll() is None:
            proc.kill()
    text = "".join(lines)
    assert proc.returncode == 0, text
    assert "SIGTERM received: checkpoint saved" in text, text
    assert "TRAIN_RETURNED" in text, text

    # metrics log records the preemption
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f if l.strip()]
    assert any(r.get("preempted") for r in records)
    # best-val metadata survived the force save; the force save landed in
    # the separate resume slot at a later step than the best (ADVICE r2)
    ckpt_dir = os.path.join(workdir, "semantic_segmentation_deeplabv3plus")
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["best_val_loss"] is not None and meta["step"] > 0
    assert meta["resume_step"] >= meta["step"]
    assert os.path.isdir(os.path.join(ckpt_dir, "state"))
    assert os.path.isdir(os.path.join(ckpt_dir, "state.resume"))

    # the checkpoint restores exactly through the public API — the newer
    # resume state wins, with the best-val slot intact underneath
    from deeplabv3plus_keras_tpu import SemanticSegmentation

    ss = SemanticSegmentation(make_conf(workdir, model_loading=True), work_dir=workdir)
    assert int(ss.state.step) == meta["resume_step"]


def test_sigterm_during_evaluate_stops_cleanly(tmp_path):
    """SIGTERM mid-evaluate exits the loop after the in-flight batch and
    returns the partial metric (no training state to save)."""
    workdir = str(tmp_path)
    conf = make_conf(workdir, epochs=1)
    child = r"""
import json, os, signal, sys, threading
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
from deeplabv3plus_keras_tpu import SemanticSegmentation
from deeplabv3plus_keras_tpu.data import make_synthetic_voc

workdir = sys.argv[1]
make_synthetic_voc(os.path.join(workdir, "resource"), n_train=4, n_val=4, n_test=0)
with open(os.path.join(workdir, "conf.json")) as f:
    conf = json.load(f)
ss = SemanticSegmentation(conf, work_dir=workdir)
# deliver SIGTERM to ourselves as soon as the first batch is consumed
orig = ss._eval_step
def stepper(*a, **k):
    os.kill(os.getpid(), signal.SIGTERM)
    return orig(*a, **k)
ss._eval_step = stepper
m = ss.evaluate(mode=1)
print("EVAL_RETURNED", float(m.result()), flush=True)
"""
    with open(os.path.join(workdir, "conf.json"), "w") as f:
        json.dump(conf, f)
    script = tmp_path / "child_eval.py"
    script.write_text(child)
    out = subprocess.run(
        [sys.executable, "-u", str(script), workdir],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SIGTERM received: evaluation stopped" in out.stdout
    assert "EVAL_RETURNED" in out.stdout


def test_sigterm_during_device_cache_build_saves_and_exits(tmp_path):
    """SIGTERM during the DeviceDataset (cache_device) build — minutes of
    decode at real scale — unwinds as Preempted; train() saves a resume
    checkpoint and returns instead of dying mid-phase."""
    workdir = str(tmp_path)
    conf = make_conf(workdir, epochs=3)
    conf["cache_device"] = True
    child = r"""
import json, os, signal, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
from deeplabv3plus_keras_tpu import SemanticSegmentation
from deeplabv3plus_keras_tpu.data import pipeline, make_synthetic_voc

workdir = sys.argv[1]
make_synthetic_voc(os.path.join(workdir, "resource"), n_train=4, n_val=2, n_test=0)
with open(os.path.join(workdir, "conf.json")) as f:
    conf = json.load(f)
ss = SemanticSegmentation(conf, work_dir=workdir)
# SIGTERM arrives while the cache build drains its first batch
orig = pipeline.HostLoader._assemble
def hooked(self, specs):
    os.kill(os.getpid(), signal.SIGTERM)
    return orig(self, specs)
pipeline.HostLoader._assemble = hooked
ss.train()
print("TRAIN_RETURNED", flush=True)
"""
    with open(os.path.join(workdir, "conf.json"), "w") as f:
        json.dump(conf, f)
    script = tmp_path / "child_cache.py"
    script.write_text(child)
    out = subprocess.run(
        [sys.executable, "-u", str(script), workdir],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SIGTERM received: checkpoint saved" in out.stdout
    assert "TRAIN_RETURNED" in out.stdout
    # the resume slot exists and restores through the public API
    ckpt_dir = os.path.join(workdir, "semantic_segmentation_deeplabv3plus")
    assert os.path.isdir(os.path.join(ckpt_dir, "state.resume"))
