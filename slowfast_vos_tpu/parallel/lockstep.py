"""Lockstep ensemble training: N INDEPENDENT fine-tunes, one per device.

The OSVOS workload (`code/osvos/run_osvos_for_all_seq.py:10-44`) is 20
independent per-sequence fine-tunes — the reference runs them one after
another on one GPU. On a TPU slice the natural mapping is one fine-tune per
chip: the train state gains a leading [n_devices] axis sharded over 'data'
and the per-device step is the UNMODIFIED single-sequence `Trainer` step —
crucially with NO gradient psum (unlike `parallel/sharded.py`, these are
separate optimization problems, not one data-parallel one), so the only
cross-device cost is the lockstep dispatch barrier.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slowfast_vos_tpu.train.train_step import Trainer, TrainState


def stack_replicate(tree, n: int, mesh: Mesh):
    """Give every leaf a leading [n] axis (identical copies) sharded over
    'data' — the starting state of n identical fine-tunes that then diverge."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.device_put(
            np.broadcast_to(np.asarray(x), (n, *np.shape(x))), sharding
        ),
        tree,
    )


def make_lockstep_train_step(trainer: Trainer, mesh: Mesh):
    """step(stacked_state, key, stacked_batch) -> (stacked_state, metrics).

    Every leaf of state/batch/metrics carries a leading [n_devices] axis over
    'data'; `key` is ONE PRNGKey used by all members — matching the serial
    driver, which seeds every sequence's fine-tune identically
    (`train/osvos.py:109`, reference seed-63 discipline)."""

    def per_device(state: TrainState, key, batch):
        state = jax.tree.map(lambda x: x[0], state)
        batch = jax.tree.map(lambda x: x[0], batch)
        new_state, metrics = trainer._step_impl(state, key, batch)
        add_axis = lambda t: jax.tree.map(lambda x: x[None], t)
        return add_axis(new_state), add_axis(metrics)

    d = P("data")
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(d, P(), d), out_specs=(d, d), check_vma=False,
    ))


def stack_batches(batches: list[dict]) -> dict:
    """Stack per-member host batches into one [n, ...] HOST batch (numpy on
    purpose: this runs inside the prefetch producer thread, which must never
    dispatch device ops — utils/prefetch.py design constraint)."""
    return {k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]}


def unstack_member(tree, k: int):
    """Pull member k's slice of a stacked tree back to host numpy."""
    return jax.tree.map(lambda x: np.asarray(x[k]), tree)
