"""Paste per-roi mask logits back into full-image masks, on device.

Replaces torchvision's `paste_masks_in_image` (reference calls it through
`transform.postprocess`, `code/helpers/model.py:347`; it is CPU-bound in torch,
see the FIXME the reference vendors at `code/maskrcnn/engine.py:95-96`).

TPU-native formulation: instead of resizing each M x M mask to its (dynamic)
box size and blitting, every canvas pixel bilinearly samples the mask at the
inverse box transform — one fixed-shape vectorized op over [N, H, W], matching
torchvision's `interpolate(..., mode='bilinear', align_corners=False)` plus the
box-extent (+1 pixel) paste convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("image_hw",))
def paste_masks_in_image(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    image_hw: tuple[int, int],
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Args:
      masks: [N, M, M] mask probabilities (post-sigmoid) in roi space.
      boxes: [N, 4] XYXY in image coordinates.
      image_hw: static (H, W) output canvas.
      valid: optional [N] bool — invalid rois produce all-zero masks.
    Returns:
      [N, H, W] float mask probabilities on the image canvas.
    """
    n, m, _ = masks.shape
    h, w = image_hw
    # torchvision: integer box with TO_REMOVE=1 extent.
    x0 = jnp.floor(boxes[:, 0])
    y0 = jnp.floor(boxes[:, 1])
    bw = jnp.maximum(jnp.floor(boxes[:, 2]) - x0 + 1.0, 1.0)
    bh = jnp.maximum(jnp.floor(boxes[:, 3]) - y0 + 1.0, 1.0)

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    # Canvas pixel -> continuous mask coordinate (align_corners=False).
    u = (xs[None, :] - x0[:, None] + 0.5) * (m / bw)[:, None] - 0.5  # [N, W]
    v = (ys[None, :] - y0[:, None] + 0.5) * (m / bh)[:, None] - 0.5  # [N, H]

    inside_x = (xs[None, :] >= x0[:, None]) & (xs[None, :] < x0[:, None] + bw[:, None])
    inside_y = (ys[None, :] >= y0[:, None]) & (ys[None, :] < y0[:, None] + bh[:, None])

    uc = jnp.clip(u, 0.0, m - 1.0)
    vc = jnp.clip(v, 0.0, m - 1.0)
    u0 = jnp.floor(uc).astype(jnp.int32)
    v0 = jnp.floor(vc).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, m - 1)
    v1 = jnp.minimum(v0 + 1, m - 1)
    lu = uc - u0
    lv = vc - v0

    def sample(vi, ui):
        # masks [N,M,M]; vi [N,H], ui [N,W] -> [N,H,W]
        ni = jnp.arange(n)[:, None, None]
        return masks[ni, vi[:, :, None], ui[:, None, :]]

    out = (
        sample(v0, u0) * ((1 - lv)[:, :, None] * (1 - lu)[:, None, :])
        + sample(v0, u1) * ((1 - lv)[:, :, None] * lu[:, None, :])
        + sample(v1, u0) * (lv[:, :, None] * (1 - lu)[:, None, :])
        + sample(v1, u1) * (lv[:, :, None] * lu[:, None, :])
    )
    out = jnp.where(inside_y[:, :, None] & inside_x[:, None, :], out, 0.0)
    if valid is not None:
        out = jnp.where(valid[:, None, None], out, 0.0)
    return out
