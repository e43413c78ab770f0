"""Device-mesh construction and sharding layout.

The reference is a single-process, single-device trainer whose only
parallelism hooks are the vestigial ``multi_gpu``/``num_gpus`` config keys
(conf.json:6-7; ``self.parallel_model`` is never constructed,
semantic_segmentation.py:1222-1223).  Here those keys drive a real
``jax.sharding.Mesh``:

- axis ``'data'``  — batch (data parallelism; the gradient all-reduce is a
  ``psum`` inserted by GSPMD over ICI when the batch is sharded and params
  are replicated),
- axis ``'space'`` — optional spatial sharding of the image height for
  large images (the sequence-parallel analogue for a conv net; XLA's SPMD
  partitioner inserts the conv halo exchanges automatically).

Params/optimizer state are replicated: this model is ~2-60 M params, so DP
is the right axis; channel/tensor sharding would only add collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(n_data: int | None = None, n_space: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'space') mesh over the first n_data*n_space devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(1, len(devices) // n_space)
    need = n_data * n_space
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """(B, H, W, C) arrays: batch over 'data', optionally H over 'space'."""
    if spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) per-sample vectors (e.g. validity masks)."""
    return NamedSharding(mesh, P(DATA_AXIS))
