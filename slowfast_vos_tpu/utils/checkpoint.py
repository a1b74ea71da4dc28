"""Checkpoint save/restore via orbax.

Covers the reference's checkpointing surface (`code/train.py:112-121`): best
model, last model, and a resumable {epoch, optimizer} checkpoint — expressed
here as whole-TrainState pytree checkpoints plus a small JSON sidecar.
"""
from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, meta: dict | None = None):
    """Save a pytree (e.g. TrainState or a variables dict) to `path`."""
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_variables(path: str) -> dict:
    """Restore a checkpoint WITHOUT a structural target and extract model
    variables {params, batch_stats} — works for both TrainState checkpoints
    (params+frozen merged, optimizer state ignored) and raw variables dicts.
    Use this to hand weights between stages with different optimizers
    (e.g. maskrcnn pretrain -> SlowFast training -> OSVOS)."""
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    if "params" in raw and "frozen" in raw:  # TrainState layout
        params = {**raw["params"], **raw["frozen"]}
        return {"params": params, "batch_stats": raw.get("batch_stats", {}) or {}}
    if "params" in raw:  # variables layout
        return {"params": raw["params"], "batch_stats": raw.get("batch_stats", {}) or {}}
    raise ValueError(f"unrecognized checkpoint structure at {path}: {list(raw)}")


def restore_checkpoint(path: str, target=None):
    """Restore a pytree; `target` (same structure) restores concrete dtypes/
    shardings. Returns (state, meta|None)."""
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    if target is not None:
        restored = ckpt.restore(path, item=jax.device_get(target))
    else:
        restored = ckpt.restore(path)
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return restored, meta
