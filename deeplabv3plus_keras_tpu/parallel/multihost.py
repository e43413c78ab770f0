"""Multi-host (multi-process) SPMD input plumbing.

The reference is a single-process trainer (SURVEY §2.2); the mesh layer
(mesh.py) already scales the step functions across any number of chips in
ONE process.  This module adds what a multi-host TPU pod needs on top:

- each host decodes only its own shard of the dataset (``shard_specs``),
- host-local numpy batches are assembled into global, batch-sharded
  ``jax.Array``s with ``jax.make_array_from_process_local_data``
  (``globalize_batch``), which the existing pjit'd step functions consume
  unchanged — GSPMD then emits the gradient psum over ICI across all hosts.

Recipe (per process)::

    jax.distributed.initialize(coordinator, num_processes, process_id)
    mesh  = make_mesh(n_data=jax.device_count())     # global mesh
    specs = shard_specs(all_specs)                   # this host's shard
    for host_batch in HostLoader(specs, ...):
        batch = globalize_batch(prepared(host_batch), mesh)
        state, metrics = train_step(state, batch, rng)

Works identically in a single process (process_count=1), which is how the
virtual-device tests exercise it.
"""

from __future__ import annotations

import jax
import numpy as np

from . import mesh as mesh_lib


def shard_specs(specs, process_index: int | None = None,
                process_count: int | None = None,
                mark_duplicates: bool = False):
    """This process's dataset shard, padded so every host sees the SAME
    number of samples (and therefore the same step count — unequal steps
    would desynchronize the collectives and hang the pod).

    Strided split (specs[pi::pc]) keeps shards interleaved under the
    loader's epoch shuffling; hosts whose shard is one short wrap around to
    the beginning of their own shard.

    ``mark_duplicates=True`` stamps the wrap-around padding specs with
    ``valid=False``: the loader then emits them with a 0 batch-validity
    mask, so metrics (multi-host evaluate) never double-count a wrapped
    sample (ADVICE r2).  Leave False for training, where a live duplicate
    is the standard way to keep every host's batch full.
    """
    import dataclasses

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(specs)
    mine = list(specs[pi::pc])
    if not mine:  # more hosts than samples: wrap the global list
        seed = specs[pi % len(specs)]
        if mark_duplicates:  # another host owns it: don't count it here
            seed = dataclasses.replace(seed, valid=False)
        mine = [seed]
    base = len(mine)
    n_steps = -(-len(specs) // pc)  # ceil: the longest shard's length
    while len(mine) < n_steps:
        dup = mine[len(mine) % base]
        if mark_duplicates:
            dup = dataclasses.replace(dup, valid=False)
        mine.append(dup)
    return mine


def globalize_batch(batch: dict, mesh, spatial: bool = False) -> dict:
    """Assemble a host-local prepared batch into global batch-sharded
    arrays over ``mesh``.

    ``batch``: {'image': (b,S,S,3), 'label': (b,...) optional,
    'valid': (b,)} with b = per-process batch; the returned global arrays
    have leading dim b × process_count and the exact shardings the step
    functions were jit'ed with, so no resharding happens at dispatch.
    """
    bsh = mesh_lib.batch_sharding(mesh, spatial)
    ssh = mesh_lib.sample_sharding(mesh)
    out = {}
    for key, val in batch.items():
        if key == "names":
            out[key] = val
            continue
        sh = ssh if np.ndim(val) == 1 else bsh
        out[key] = jax.make_array_from_process_local_data(sh, np.asarray(val))
    return out
