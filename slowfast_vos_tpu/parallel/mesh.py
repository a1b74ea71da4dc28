"""Device mesh helpers.

The reference's only distributed machinery is a vendored, unused-in-practice
DDP/NCCL layer (`code/maskrcnn/utils.py:261-327`, SURVEY.md §2c/§5.8). The
TPU-native story is SPMD over a `jax.sharding.Mesh`:

* axis "data" — data parallelism over training windows / eval sequences
  (replaces DistributedSampler + DDP allreduce; XLA emits the psum over ICI);
* axis "time" (optional) — the frozen backbone is embarrassingly parallel
  over clip frames, so frame batches shard over chips too: the natural
  "sequence parallel" analogue for this model family (SURVEY.md §2c).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_names=("data",), shape=None) -> Mesh:
    """Mesh over the GLOBAL device list — process-count aware: after
    `parallel.distributed.init_distributed_mode` every host sees all hosts'
    devices, so the same mesh/shard_map code runs single- or multi-host
    (each process feeds its `local_batch_slice` of the global batch)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    assert shape is not None, "give an explicit shape for multi-axis meshes"
    return Mesh(devices.reshape(shape), axis_names)
