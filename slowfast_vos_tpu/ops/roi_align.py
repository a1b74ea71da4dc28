"""RoIAlign for TPU — XLA vectorized implementation + FPN multi-scale wrapper.

Replaces `torchvision.ops.roi_align` (C++/CUDA) used by the reference via
`MultiScaleRoIAlign` inside the RoI heads (reference `code/helpers/model.py:346`;
SURVEY.md §2b). Semantics match torchvision's `aligned=False` convention:

* roi coords scaled by `spatial_scale` with no half-pixel offset;
* roi width/height floored at 1;
* `sampling_ratio` (=2 for Mask R-CNN) bilinear samples per bin side, averaged;
* samples with y<-1 or y>H (resp. x) contribute exactly 0; in-range coords are
  clamped to [0, H-1] and the top edge collapses (y_low==y_high==H-1).

The implementation is a dense gather + weighted sum, fully batched over rois so
XLA lowers it onto the VPU with no per-roi Python. This exact gather form is
used for the mask-branch 14x14 pool, all TRAINING pools (it is differentiable),
and CPU runs; the hot inference 7x7 pool over 1000 proposals/frame rides the
Pallas patch-DMA kernel on TPU (`ops/roi_align_pallas.py`, measured 1.8x
faster; exact except for a documented >4:1-aspect patch-clamp tail —
`Pipeline(pallas_pool7=False)` restores this gather form everywhere).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample `feat` [H,W,C] at the outer product of ys [N,S] x xs [N,S].

    Returns [N, S, S, C]. Out-of-range samples (per torchvision rule) are 0.
    """
    h, w, _ = feat.shape
    my = (ys >= -1.0) & (ys <= h)
    mx = (xs >= -1.0) & (xs <= w)
    mask = my[:, :, None] & mx[:, None, :]

    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0.astype(y.dtype)
    lx = x - x0.astype(x.dtype)
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yi, xi):
        # [N,S] x [N,S] -> [N,S,S,C]
        return feat[yi[:, :, None], xi[:, None, :]]

    val = (
        g(y0, x0) * (hy[:, :, None] * hx[:, None, :])[..., None]
        + g(y0, x1) * (hy[:, :, None] * lx[:, None, :])[..., None]
        + g(y1, x0) * (ly[:, :, None] * hx[:, None, :])[..., None]
        + g(y1, x1) * (ly[:, :, None] * lx[:, None, :])[..., None]
    )
    return jnp.where(mask[..., None], val, 0.0)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign on a single feature map.

    Args:
      feat: [H, W, C] feature map (channels-last, TPU friendly).
      rois: [N, 4] XYXY boxes in image coordinates.
      spatial_scale: feature-map stride reciprocal (e.g. 0.25 for P2).
    Returns:
      [N, output_size, output_size, C].
    """
    rois = rois.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    sr = sampling_ratio
    s = output_size * sr
    # Sample coordinate for (bin ph, subsample iy):
    #   y = y1 + ph*bin_h + (iy+0.5)*bin_h/sr  ==  y1 + (ph*sr + iy + 0.5) * (bin_h/sr)
    steps = jnp.arange(s, dtype=jnp.float32) + 0.5  # flattened ph*sr+iy+0.5
    ys = y1[:, None] + steps[None, :] * (bin_h / sr)[:, None]  # [N, S]
    xs = x1[:, None] + steps[None, :] * (bin_w / sr)[:, None]

    vals = _bilinear_gather(feat, ys, xs)  # [N, S, S, C]
    n, _, _, c = vals.shape
    vals = vals.reshape(n, output_size, sr, output_size, sr, c)
    return vals.mean(axis=(2, 4))


def fpn_level_assignment(
    rois: jnp.ndarray,
    num_levels: int = 4,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    min_level: int = 2,
) -> jnp.ndarray:
    """FPN level index per roi: k = floor(k0 + log2(sqrt(area)/224 + eps)),
    clamped to [min_level, min_level+num_levels-1], returned 0-based.

    Mirrors torchvision's LevelMapper used by the reference's RoI heads
    (SURVEY.md §2b: "FPN level assignment k = ⌊4 + log2(√area/224)⌋").
    """
    area = jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0
    )
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6))
    k = jnp.clip(k, min_level, min_level + num_levels - 1)
    return (k - min_level).astype(jnp.int32)


def multiscale_roi_align(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: Sequence[float],
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Multi-scale RoIAlign over FPN levels with canonical level assignment.

    TPU formulation: the pyramid is flattened into ONE [sum(H_l*W_l), C]
    buffer and each roi's bilinear sample indices are offset by its assigned
    level's base — a single gather pass instead of pooling every roi on every
    level. All shapes stay static; per-roi level parameters (scale, H, W,
    base offset) are themselves tiny gathers from constant arrays.

    Args:
      feats: list of [H_l, W_l, C] maps, fine-to-coarse (P2..P5).
      rois: [N, 4] XYXY in image coordinates.
      spatial_scales: matching strides reciprocal, e.g. (1/4, 1/8, 1/16, 1/32).
    Returns:
      [N, output_size, output_size, C] float32.
    """
    c = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)
    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    bases = jnp.asarray([0] + list(np.cumsum(sizes)[:-1]), jnp.int32)
    scales = jnp.asarray(spatial_scales, jnp.float32)

    levels = fpn_level_assignment(rois, num_levels=len(feats))  # [N]
    r_scale = scales[levels]
    r_h = hs[levels]
    r_w = ws[levels]
    r_base = bases[levels]
    r_wi = r_w.astype(jnp.int32)

    b = rois.astype(jnp.float32) * r_scale[:, None]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    sr = sampling_ratio
    s = output_size * sr
    steps = jnp.arange(s, dtype=jnp.float32) + 0.5
    ys = y1[:, None] + steps[None, :] * (roi_h / output_size / sr)[:, None]  # [N,S]
    xs = x1[:, None] + steps[None, :] * (roi_w / output_size / sr)[:, None]

    my = (ys >= -1.0) & (ys <= r_h[:, None])
    mx = (xs >= -1.0) & (xs <= r_w[:, None])
    mask = my[:, :, None] & mx[:, None, :]

    y = jnp.clip(ys, 0.0, r_h[:, None] - 1.0)
    x = jnp.clip(xs, 0.0, r_w[:, None] - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, r_h[:, None].astype(jnp.int32) - 1)
    x1i = jnp.minimum(x0 + 1, r_w[:, None].astype(jnp.int32) - 1)
    # Interpolation weights in the FEATURE dtype: gathered bf16 values times
    # f32 weights would upcast the [N,S,S,C] temporaries to f32 and double
    # the dominant memory term of the whole detection graph.
    wdt = flat.dtype if jnp.issubdtype(flat.dtype, jnp.floating) else jnp.float32
    ly = (y - y0.astype(jnp.float32)).astype(wdt)
    lx = (x - x0.astype(jnp.float32)).astype(wdt)
    hy = 1 - ly
    hx = 1 - lx

    def g(yi, xi):
        idx = r_base[:, None, None] + yi[:, :, None] * r_wi[:, None, None] + xi[:, None, :]
        return flat[idx]  # [N, S, S, C]

    val = (
        g(y0, x0) * (hy[:, :, None] * hx[:, None, :])[..., None]
        + g(y0, x1i) * (hy[:, :, None] * lx[:, None, :])[..., None]
        + g(y1i, x0) * (ly[:, :, None] * hx[:, None, :])[..., None]
        + g(y1i, x1i) * (ly[:, :, None] * lx[:, None, :])[..., None]
    )
    val = jnp.where(mask[..., None], val, 0.0).astype(jnp.float32)
    n = rois.shape[0]
    out = val.reshape(n, output_size, sr, output_size, sr, c).mean(axis=(2, 4))
    # Preserve the feature dtype (bf16 in production keeps the [N*P,7,7,C]
    # pooled buffer half the size; f32 inputs keep exact-parity tests exact).
    return out.astype(feats[0].dtype)
