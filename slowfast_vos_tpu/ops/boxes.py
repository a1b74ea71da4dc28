"""Box primitives (XYXY convention), jit-friendly and fully vectorized.

TPU-native replacements for the torchvision box utilities the reference relies
on through its Mask R-CNN (see SURVEY.md §2b). Everything here takes/returns
fixed-shape arrays and works under vmap/jit — invalid (padded) boxes are
handled by the callers via validity masks, never by dynamic shapes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

# torchvision BoxCoder clamps dw/dh at log(1000/16) before exp to avoid overflow.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] XYXY boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. boxes1 [N,4], boxes2 [M,4] -> [N,M]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def clip_boxes(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip XYXY boxes to [0,W]x[0,H]. image_hw: (h, w) scalars or arrays."""
    h, w = image_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Boolean mask of boxes with both sides >= min_size (no dynamic shapes)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def _boxes_to_cxcywh(boxes):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(reference: jnp.ndarray, proposals: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode `reference` (gt) boxes relative to `proposals` (anchors/rois).

    Matches the Faster R-CNN BoxCoder parameterization:
    t = (wx*(dx/w), wy*(dy/h), ww*log(gw/w), wh*log(gh/h)).
    """
    wx, wy, ww, wh = weights
    pcx, pcy, pw, ph = _boxes_to_cxcywh(proposals)
    gcx, gcy, gw, gh = _boxes_to_cxcywh(reference)
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    tx = wx * (gcx - pcx) / pw
    ty = wy * (gcy - pcy) / ph
    tw = ww * jnp.log(jnp.maximum(gw, 1e-6) / pw)
    th = wh * jnp.log(jnp.maximum(gh, 1e-6) / ph)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(deltas: jnp.ndarray, boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Apply regression `deltas` [..., 4] to anchor/proposal `boxes` [..., 4]."""
    wx, wy, ww, wh = weights
    pcx, pcy, pw, ph = _boxes_to_cxcywh(boxes)
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, max=BBOX_XFORM_CLIP)
    cx = dx * pw + pcx
    cy = dy * ph + pcy
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)
