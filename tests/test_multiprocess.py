"""TRUE multi-process SPMD: two OS processes (one per simulated host, 4
virtual CPU devices each) jointly train one step of the model over a
global 8-device ('data','space') mesh using the multihost recipe —
shard_specs → HostLoader decode → device preprocessing → globalize_batch →
sharded train step with the gradient psum crossing process boundaries
(Gloo).  Both processes must report the same loss, and it must match a
single-process 8-virtual-device run on the same global batch."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two compile-heavy subprocesses, 1-CPU host

CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # device count comes from jax_num_cpu_devices
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid, nproc, root, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from deeplabv3plus_keras_tpu.data import HostLoader, MODE_TRAIN, pascal_voc_2012
from deeplabv3plus_keras_tpu.data.pipeline import device_batches
from deeplabv3plus_keras_tpu.models import init_model
from deeplabv3plus_keras_tpu.parallel import (
    build_train_step, create_train_state, globalize_batch, make_mesh,
    shard_specs, shard_step,
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from common_conf import tiny_conf  # written by the parent next to this script

conf = tiny_conf(batch=8)
model, variables = init_model(conf, jax.random.PRNGKey(0))
state, tx = create_train_state(conf, variables)
mesh = make_mesh(n_data=4, n_space=2)  # 8 global devices, 2 processes
step = shard_step(build_train_step(model, tx, conf), mesh, kind="train",
                  spatial=True)

specs = pascal_voc_2012(root, MODE_TRAIN)           # 8 images, global order
mine = shard_specs(specs)                            # this host's 4
loader = HostLoader(mine, batch_size=4, canvas_size=64, workers=1)
local = next(iter(device_batches(loader, conf.nn_arch.image_size, 21)))
local.pop("names")
batch = globalize_batch({k: np.asarray(v) for k, v in local.items()}, mesh,
                        spatial=True)
state, metrics = step(state, batch, jax.random.PRNGKey(7))
print(f"RESULT pid={pid} loss={float(metrics['loss']):.6f}", flush=True)
"""

COMMON = r"""
from deeplabv3plus_keras_tpu.config import Config, MiddleOp


def tiny_conf(batch):
    c = Config()
    c.base_model = "mobilenetv2"
    c.nn_arch.image_size = 64
    c.nn_arch.boundary_refinement = False
    c.nn_arch.reduction_size = 16
    c.nn_arch.concat_channels = 16
    c.nn_arch.encoder_middle_conf = [MiddleOp(op="conv", kernel=1, input=-1)]
    c.nn_arch.dropout_rate = 0.0
    c.hps.batch_size = batch
    return c
"""


def test_two_process_training_step(tmp_path):
    from deeplabv3plus_keras_tpu.data import make_synthetic_voc

    root = make_synthetic_voc(
        str(tmp_path / "voc"), n_train=8, n_val=0, n_test=0,
        min_size=48, max_size=64,
    )
    (tmp_path / "common_conf.py").write_text(COMMON)
    script = tmp_path / "child.py"
    script.write_text(CHILD)

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(pid), "2", root, "12379"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    losses = {}
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, out
        for line in out.splitlines():
            if line.startswith("RESULT"):
                losses[pid] = float(line.split("loss=")[1])
    assert set(losses) == {0, 1}, outs
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1]  # identical global computation

    # single-process reference on the same global batch (this pytest
    # process already has 8 virtual devices)
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(tmp_path))
    try:
        from common_conf import tiny_conf
    finally:
        sys.path.remove(str(tmp_path))

    from deeplabv3plus_keras_tpu.data import HostLoader, MODE_TRAIN, pascal_voc_2012
    from deeplabv3plus_keras_tpu.data.pipeline import device_batches
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.parallel import (
        build_train_step,
        create_train_state,
        make_mesh,
        shard_specs,
        shard_step,
    )

    conf = tiny_conf(batch=8)
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    state, tx = create_train_state(conf, variables)
    mesh = make_mesh(n_data=4, n_space=2)
    step = shard_step(
        build_train_step(model, tx, conf), mesh, kind="train", spatial=True
    )
    specs = pascal_voc_2012(root, MODE_TRAIN)
    # global batch in mesh order = proc0's shard then proc1's shard
    ordered = shard_specs(specs, 0, 2) + shard_specs(specs, 1, 2)
    loader = HostLoader(ordered, batch_size=8, canvas_size=64, workers=1)
    batch = next(iter(device_batches(loader, conf.nn_arch.image_size, 21)))
    batch.pop("names")
    _, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isclose(losses[0], float(metrics["loss"]), atol=1e-5), (
        losses,
        float(metrics["loss"]),
    )
