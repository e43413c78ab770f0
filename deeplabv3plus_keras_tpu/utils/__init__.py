from .profiling import MetricsLogger, StepTimer, profiler_trace
from .pretrained import load_pretrained_backbone

__all__ = [
    "MetricsLogger",
    "StepTimer",
    "profiler_trace",
    "load_pretrained_backbone",
]
