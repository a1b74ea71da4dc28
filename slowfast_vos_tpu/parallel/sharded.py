"""Data-parallel training step over a device mesh via shard_map.

Replaces the reference's DDP gradient sync (`code/maskrcnn/train.py:102`,
`utils.py:122-146`) with explicit SPMD: each device consumes one training
window, computes grads, and a `psum`-mean over the "data" axis synchronizes
them — compiled by XLA into ICI collectives, no NCCL/pickle.

BatchNorm batch statistics are also pmean-synced across devices (cross-replica
sync-BN; the reference's single-device BN has nothing to sync).
"""
from __future__ import annotations

import jax
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from slowfast_vos_tpu.train.train_step import Trainer, TrainState


def replicate_state(state: TrainState, mesh) -> TrainState:
    """Place the (replicated) train state on the mesh.

    Multi-host: `device_put` cannot target non-addressable devices, so the
    replicated global array is assembled from the (identical, deterministic)
    host-local copies via `host_local_array_to_global_array` — the blessed
    multi-process path."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            jax.tree.map(np.asarray, state), mesh, jax.tree.map(lambda _: P(), state)
        )
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def stack_windows(windows: list) -> dict:
    """Stack a list of per-window batch dicts into one [n, ...] batch."""
    return {k: np.stack([np.asarray(w[k]) for w in windows]) for k in windows[0]}


def shard_windows(batch: dict, mesh) -> dict:
    """Place a stacked window batch with the leading axis on 'data'.

    Single-process: `batch` is the full [n_dev, ...] global batch.
    Multi-process: `batch` is this process's LOCAL [n_local_dev, ...] shard of
    the globally-ordered batch (`distributed.local_batch_slice`); the global
    array is assembled across hosts without any data movement."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            jax.tree.map(np.asarray, batch),
            mesh,
            jax.tree.map(lambda _: P("data"), batch),
        )

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, batch)


def make_sharded_train_step(trainer: Trainer, mesh):
    """Returns step(state, key, batch) where batch leaves have a leading
    [n_devices] axis sharded over 'data'. State is replicated; the returned
    state/metrics are identical on every device."""

    def per_device(state: TrainState, key, batch):
        batch = jax.tree.map(lambda x: x[0], batch)  # local shard -> one window
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        (loss, (metrics, new_bn)), grads = jax.value_and_grad(
            trainer._loss_fn, has_aux=True
        )(state.params, state.frozen, state.batch_stats, key, batch)
        grads = jax.lax.pmean(grads, "data")
        metrics = jax.lax.pmean(metrics, "data")
        new_bn = jax.lax.pmean(new_bn, "data")
        updates, new_opt = trainer.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bn,
            opt_state=new_opt,
        )
        return new_state, metrics

    n_batch_axes = {"images": 1, "feat_valid": 1, "frame_valid": 1, "boxes": 1,
                    "labels": 1, "gt_valid": 1, "masks": 1}
    del n_batch_axes  # (documentation only: every leaf gains one leading axis)

    batch_spec = jax.tree.map(lambda _: P("data"), {
        "images": 0, "feat_valid": 0, "frame_valid": 0, "boxes": 0,
        "labels": 0, "gt_valid": 0, "masks": 0,
    })

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
