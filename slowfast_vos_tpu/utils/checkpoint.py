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


def migrate_params(loaded_params: dict, target_params: dict) -> dict:
    """Adapt loaded params to the target's layout where an EXACT transform
    exists. Currently: the stem kernel remaps BOTH ways between the standard
    7x7 [7,7,3,64] and space-to-depth [4,4,12,64] layouts (the map is
    injective, so either checkpoint generation loads into either model)."""
    try:
        k = loaded_params["backbone"]["body"]["conv1"]["kernel"]
        t = target_params["backbone"]["body"]["conv1"]["kernel"]
    except (KeyError, TypeError):
        return loaded_params
    import numpy as np

    remap = None
    if tuple(np.shape(k)) == (7, 7, 3, 64) and tuple(np.shape(t)) == (4, 4, 12, 64):
        from slowfast_vos_tpu.models.resnet_fpn import stem_kernel_to_s2d as remap
    elif tuple(np.shape(k)) == (4, 4, 12, 64) and tuple(np.shape(t)) == (7, 7, 3, 64):
        from slowfast_vos_tpu.models.resnet_fpn import stem_kernel_from_s2d as remap
    if remap is not None:
        out = {**loaded_params}
        out["backbone"] = {**loaded_params["backbone"]}
        out["backbone"]["body"] = {**loaded_params["backbone"]["body"]}
        out["backbone"]["body"]["conv1"] = {"kernel": remap(np.asarray(k))}
        return out
    return loaded_params


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
