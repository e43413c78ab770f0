"""utils/: profiling helpers and metrics logging."""

import json
import os

from deeplabv3plus_keras_tpu.utils import MetricsLogger, StepTimer, profiler_trace


def test_step_timer_stats():
    t = StepTimer(warmup=1)
    for _ in range(5):
        with t:
            pass
    s = t.stats()
    assert s["steps"] == 4
    assert s["mean_s"] >= 0 and s["p50_s"] >= 0 and s["p95_s"] >= 0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log({"epoch": 1, "loss": 0.5})
    log.log({"epoch": 2, "loss": 0.25})
    lines = [json.loads(l) for l in open(path)]
    assert [l["epoch"] for l in lines] == [1, 2]
    assert all("ts" in l for l in lines)


def test_metrics_logger_disabled_is_noop():
    MetricsLogger(None).log({"x": 1})  # must not raise


def test_profiler_trace_noop_without_logdir():
    with profiler_trace(None):
        pass


def test_profiler_trace_writes(tmp_path):
    import jax

    logdir = str(tmp_path / "prof")
    with profiler_trace(logdir):
        jax.numpy.ones((8, 8)).sum().block_until_ready()
    # a plugins/profile/<ts>/ tree with an .xplane.pb appears
    found = []
    for root, _, files in os.walk(logdir):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, f"no trace written under {logdir}"
