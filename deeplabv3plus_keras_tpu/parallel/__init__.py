from .mesh import make_mesh, batch_sharding, replicated, DATA_AXIS, SPACE_AXIS
from .multihost import shard_specs, globalize_batch
from .step import (
    TrainState,
    create_train_state,
    build_train_step,
    build_eval_step,
    build_predict_step,
    build_label_step,
    shard_step,
    default_class_weights,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "DATA_AXIS",
    "SPACE_AXIS",
    "TrainState",
    "create_train_state",
    "build_train_step",
    "build_eval_step",
    "build_predict_step",
    "build_label_step",
    "shard_step",
    "default_class_weights",
    "shard_specs",
    "globalize_batch",
]
