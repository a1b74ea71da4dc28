"""Convert reference PyTorch checkpoints into this framework's param pytrees.

The reference's weights are torchvision `maskrcnn_resnet50_fpn` state dicts —
either the DAVIS-fine-tuned `maskrcnn_model.pth`
(`code/maskrcnn/maskrcnn_src.py:270`) or full `SegmentationModel` state dicts
that additionally carry `slow_fast.*` (`code/train.py:112-121`). This module
maps those names/layouts onto our flax tree:

* conv weights   [O,I,kh,kw]      -> HWIO [kh,kw,I,O]
* conv3d weights [O,I,kt,kh,kw]   -> [kt,kh,kw,I,O]
* linear weights [out,in]         -> [in,out]
* fc6 (first linear after RoI pooling) additionally permutes its input axis
  from torch's CHW flatten order to our HWC flatten order;
* ConvTranspose2d [I,O,kh,kw]     -> [kh,kw,I,O] (flax `transpose_kernel=False`
  convention is verified against torch in tests);
* BatchNorm running stats land in FrozenBatchNorm params (backbone) or the
  `batch_stats` collection (SlowFast BN).

Works with torch-free inputs too: any {name: numpy array} mapping.
"""
from __future__ import annotations

import re

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth state dict into {name: np.ndarray} (torch cpu build)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv(w):
    # torch ConvTranspose2d [I,O,kh,kw] -> flax ConvTranspose (transpose_kernel
    # =False) wants the SPATIALLY FLIPPED [kh,kw,I,O] kernel (verified exact in
    # tests/test_convert.py).
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _linear(w):
    return np.transpose(w, (1, 0))


def _fc6(w, pooled=7, channels=256):
    """torch flattens CHW; we flatten HWC."""
    out = w.shape[0]
    return (
        w.reshape(out, channels, pooled, pooled)
        .transpose(0, 2, 3, 1)
        .reshape(out, channels * pooled * pooled)
        .T
    )


# SlowFast layer name mapping (reference model.py:47-67 -> models/slowfast.py)
_SF_MAP = {
    "fast_conv1": "fast1_conv", "bn_f1": "fast1_bn",
    "slow_conv1": "slow1_conv", "bn_s1": "slow1_bn",
    "fast_conv2": "fast2_conv", "bn_f2": "fast2_bn",
    "slow_conv2": "slow2_conv", "bn_s2": "slow2_bn",
    "fast_conv3": "fast3_conv", "bn_f3": "fast3_bn",
    "slow_conv3": "slow3_conv", "bn_s3": "slow3_bn",
    "conv_f2s1": "f2s1_conv", "bn_f2s1": "f2s1_bn",
    "conv_f2s2": "f2s2_conv", "bn_f2s2": "f2s2_bn",
}


def _set(tree, path, value, used, name):
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = path[-1]
    assert leaf in node, f"missing target {'/'.join(path)} for {name}"
    expected = node[leaf].shape
    assert tuple(value.shape) == tuple(expected), (
        f"{name}: shape {value.shape} != target {expected} at {'/'.join(path)}"
    )
    node[leaf] = value.astype(np.float32)
    used.add(name)


def convert_state_dict(sd: dict, variables) -> tuple[dict, dict]:
    """Map a reference state dict onto a copy of `variables`.

    Accepts both bare Mask R-CNN state dicts and full SegmentationModel ones
    (keys prefixed `maskrcnn_model.` plus `slow_fast.*`).

    Returns (new_variables, report) where report lists converted/unused source
    keys and untouched target leaves.
    """
    import jax

    # to mutable nested dict of numpy
    new_vars = jax.tree.map(np.asarray, variables)
    new_vars = jax.tree_util.tree_map_with_path(lambda _, x: x, new_vars)
    import copy

    new_vars = copy.deepcopy({k: _to_dict(v) for k, v in new_vars.items()})
    params = new_vars["params"]
    batch_stats = new_vars.setdefault("batch_stats", {})

    used: set[str] = set()
    bn_suffix = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}

    for name, w in sd.items():
        key = name
        if key.startswith("maskrcnn_model."):
            key = key[len("maskrcnn_model.") :]

        # ---- SlowFast ----
        m = re.match(r"slow_fast\.([a-z0-9_]+)\.(weight|bias|running_mean|running_var)$", name)
        if m and m.group(1) in _SF_MAP:
            src, suffix = m.groups()
            tgt = _SF_MAP[src]
            if tgt.endswith("_bn") or src.startswith("bn"):
                if suffix in ("running_mean", "running_var"):
                    _set(batch_stats, ["slow_fast", tgt, {"running_mean": "mean", "running_var": "var"}[suffix]], w, used, name)
                else:
                    _set(params, ["slow_fast", tgt, {"weight": "scale", "bias": "bias"}[suffix]], w, used, name)
            else:
                if suffix == "weight":
                    _set(params, ["slow_fast", tgt, "kernel"], _conv3d(w), used, name)
                else:
                    _set(params, ["slow_fast", tgt, "bias"], w, used, name)
            continue

        # ---- backbone body ----
        m = re.match(r"backbone\.body\.conv1\.weight$", key)
        if m:
            val = _conv(w)
            target = params["backbone"]["body"]["conv1"]["kernel"]
            if tuple(target.shape) == (4, 4, 12, 64):  # space-to-depth stem
                from slowfast_vos_tpu.models.resnet_fpn import stem_kernel_to_s2d

                val = stem_kernel_to_s2d(val)
            _set(params, ["backbone", "body", "conv1", "kernel"], val, used, name)
            continue
        m = re.match(r"backbone\.body\.bn1\.(\w+)$", key)
        if m and m.group(1) in bn_suffix:
            _set(params, ["backbone", "body", "bn1", bn_suffix[m.group(1)]], w, used, name)
            continue
        m = re.match(r"backbone\.body\.layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
        if m:
            st, blk, ci = m.groups()
            _set(params, ["backbone", "body", f"layer{st}_{blk}", f"conv{ci}", "kernel"], _conv(w), used, name)
            continue
        m = re.match(r"backbone\.body\.layer(\d)\.(\d+)\.bn(\d)\.(\w+)$", key)
        if m and m.group(4) in bn_suffix:
            st, blk, bi, sfx = m.groups()
            _set(params, ["backbone", "body", f"layer{st}_{blk}", f"bn{bi}", bn_suffix[sfx]], w, used, name)
            continue
        m = re.match(r"backbone\.body\.layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            st, blk = m.groups()
            _set(params, ["backbone", "body", f"layer{st}_{blk}", "downsample_conv", "kernel"], _conv(w), used, name)
            continue
        m = re.match(r"backbone\.body\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)$", key)
        if m and m.group(3) in bn_suffix:
            st, blk, sfx = m.groups()
            _set(params, ["backbone", "body", f"layer{st}_{blk}", "downsample_bn", bn_suffix[sfx]], w, used, name)
            continue

        # ---- FPN (both tv<=0.10 `inner_blocks.0.weight` and newer
        #      `inner_blocks.0.0.weight` layouts) ----
        m = re.match(r"backbone\.fpn\.inner_blocks\.(\d)(?:\.0)?\.(weight|bias)$", key)
        if m:
            i, sfx = m.groups()
            val = _conv(w) if sfx == "weight" else w
            _set(params, ["backbone", "fpn", f"inner_{i}", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue
        m = re.match(r"backbone\.fpn\.layer_blocks\.(\d)(?:\.0)?\.(weight|bias)$", key)
        if m:
            i, sfx = m.groups()
            val = _conv(w) if sfx == "weight" else w
            _set(params, ["backbone", "fpn", f"layer_{i}", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue

        # ---- RPN head ----
        m = re.match(r"rpn\.head\.(conv|cls_logits|bbox_pred)(?:\.0\.0)?\.(weight|bias)$", key)
        if m:
            mod, sfx = m.groups()
            val = _conv(w) if sfx == "weight" else w
            _set(params, ["rpn", mod, "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue

        # ---- box head ----
        m = re.match(r"roi_heads\.box_head\.fc6\.(weight|bias)$", key)
        if m:
            sfx = m.group(1)
            val = _fc6(w) if sfx == "weight" else w
            _set(params, ["box_head", "fc6", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue
        m = re.match(r"roi_heads\.box_head\.fc7\.(weight|bias)$", key)
        if m:
            sfx = m.group(1)
            val = _linear(w) if sfx == "weight" else w
            _set(params, ["box_head", "fc7", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue
        m = re.match(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)$", key)
        if m:
            mod, sfx = m.groups()
            val = _linear(w) if sfx == "weight" else w
            _set(params, ["box_head", mod, "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue

        # ---- mask head ----
        m = re.match(r"roi_heads\.mask_head\.mask_fcn(\d)(?:\.0)?\.(weight|bias)$", key)
        if m:
            i, sfx = m.groups()
            val = _conv(w) if sfx == "weight" else w
            _set(params, ["mask_head", f"mask_fcn{i}", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue
        m = re.match(r"roi_heads\.mask_predictor\.conv5_mask\.(weight|bias)$", key)
        if m:
            sfx = m.group(1)
            val = _deconv(w) if sfx == "weight" else w
            _set(params, ["mask_head", "conv5_mask", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue
        m = re.match(r"roi_heads\.mask_predictor\.mask_fcn_logits\.(weight|bias)$", key)
        if m:
            sfx = m.group(1)
            val = _conv(w) if sfx == "weight" else w
            _set(params, ["mask_head", "mask_fcn_logits", "kernel" if sfx == "weight" else "bias"], val, used, name)
            continue

    unused = [k for k in sd if k not in used and "num_batches_tracked" not in k]
    report = {
        "converted": len(used),
        "unused_source_keys": unused,
    }
    return new_vars, report


def _to_dict(tree):
    if isinstance(tree, dict):
        return {k: _to_dict(v) for k, v in tree.items()}
    if hasattr(tree, "items"):
        return {k: _to_dict(v) for k, v in tree.items()}
    return np.asarray(tree)
