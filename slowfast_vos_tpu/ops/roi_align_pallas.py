"""Pallas TPU kernel for multi-scale RoIAlign.

The BASELINE.json north star names this kernel: RoIAlign is the detection
stack's hottest irregular op (the reference rides torchvision's CUDA kernel,
SURVEY.md §2b). Design, following the TPU kernel playbook:

* grid = one program per roi; the roi's box, FPN level and patch origin are
  SCALAR-PREFETCHED so the kernel can start its DMA before the body runs;
* each program async-copies one fixed-size feature PATCH (PH x PW x C) from
  the roi's assigned pyramid level in HBM into VMEM — contiguous row
  segments, not per-sample random gathers;
* the pooled 7x7 (or 14x14) output is computed as two separable
  interpolation matmuls A_y @ patch @ A_x^T on the MXU, with the A matrices
  built in-register from iota comparisons (weights already average the
  `sampling_ratio` taps per bin and zero out-of-range samples);
* patch origin is clamped so the entire (clamped) sample range lies inside
  the patch for every roi the FPN level mapper can emit at DAVIS scales
  (canonical assignment bounds roi extent to < 48 feature px except for
  aspect ratios beyond ~5:1, whose tail samples clamp to the patch edge).

Exposed as `multiscale_roi_align_pallas` with the same API/semantics as
`ops/roi_align.py`; parity is tested in interpret mode on CPU and verified on
hardware (sub-1e-2 vs the gather form at f32, MXU rounding).

Measured status (v5e, 32 frames x 1000 rois, DAVIS pyramid, fetch-forced
timing — scripts/profile_roialign.py): 122 ms vs 225 ms for the gather
formulation, so THIS KERNEL is the production inference path for the
7x7 proposal pool (`Pipeline(pallas_pool7=True)`, the TPU default). The
gather form remains the default for the mask-branch 14x14 pool, training
(differentiability), and CPU. Remaining headroom: fixed-patch DMA volume
(1000 x 1.6 MB of strided row copies); per-level patch sizing (P3-P5 fit
whole in VMEM) is the known next step.

Caveat: rois wider than PATCH-8 feature pixels at their assigned level
(aspect ratios beyond ~5:1 at the level-mapper's size cap) have their tail
samples clamped to the patch edge — a documented approximation the exact
gather form does not share.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slowfast_vos_tpu.ops.roi_align import fpn_level_assignment

# Feature-pixel patch side: covers the canonical-level roi extents (<= ~44 px
# at any level for DAVIS-scale canvases) plus the up-to-7px origin alignment
# slack. Multiple of 8 (sublane tiling).
PATCH = 56


def _build_interp(start, bin_size, extent, origin, out_size: int, sr: int, patch: int):
    """A [out_size, patch]: weights of patch row k for each output bin,
    averaging the sr taps, honoring the torchvision border rules, in
    patch-relative coordinates."""
    s = out_size * sr
    # TPU iota is integer-only; cast after.
    steps = jax.lax.broadcasted_iota(jnp.int32, (s, patch), 0).astype(jnp.float32) + 0.5
    coords = start + steps * (bin_size / sr)  # absolute continuous coords
    in_range = (coords >= -1.0) & (coords <= extent)
    c = jnp.clip(coords, 0.0, extent - 1.0) - origin  # patch-relative
    c = jnp.clip(c, 0.0, patch - 1.0)  # extreme-aspect tail clamp
    c0 = jnp.floor(c)
    frac = c - c0
    k = jax.lax.broadcasted_iota(jnp.int32, (s, patch), 1).astype(jnp.float32)
    a = (k == c0) * (1.0 - frac) + (k == jnp.minimum(c0 + 1.0, patch - 1.0)) * frac
    a = a * in_range
    # average sr taps per bin: [S, patch] -> [out, patch]
    return a.reshape(out_size, sr, patch).sum(axis=1) / sr


ROIS_PER_PROGRAM = 4


def _kernel(
    iparams_ref,  # SMEM int32 [N, 4]: level, py, px, _
    fparams_ref,  # SMEM float32 [N, 8]: y1, x1, bin_h, bin_w, h, w, _, _
    f0, f1, f2, f3,  # HBM level features [H_l, W_l, C]
    out_ref,  # VMEM [B, out, out, C]
    patch_ref,  # VMEM scratch [B, PATCH, PATCH, C]
    sem,  # DMA semaphores [B]
    *,
    out_size: int,
    sr: int,
):
    """B rois per program: issue all B patch DMAs up front (they pipeline in
    the DMA engine), then compute each pooled output as it completes —
    amortizing the per-grid-step overhead that bound the 1-roi/program
    version."""
    r = pl.program_id(0)
    levels = (f0, f1, f2, f3)
    b = ROIS_PER_PROGRAM

    def dma(slot):
        ri = r * b + slot
        lv = iparams_ref[ri, 0]
        py = pl.multiple_of(iparams_ref[ri, 1], 8)
        px = pl.multiple_of(iparams_ref[ri, 2], 8)
        for li, src in enumerate(levels):
            @pl.when(lv == li)
            def _():
                pltpu.make_async_copy(
                    src.at[pl.ds(py, PATCH), pl.ds(px, PATCH), :],
                    patch_ref.at[slot],
                    sem.at[slot],
                ).start()

    for slot in range(b):
        dma(slot)

    c = patch_ref.shape[-1]
    for slot in range(b):
        # Wait (size-based semaphore wait; the extent is level-independent).
        pltpu.make_async_copy(
            f0.at[pl.ds(0, PATCH), pl.ds(0, PATCH), :], patch_ref.at[slot], sem.at[slot]
        ).wait()
        ri = r * b + slot
        py = pl.multiple_of(iparams_ref[ri, 1], 8)
        px = pl.multiple_of(iparams_ref[ri, 2], 8)
        y1 = fparams_ref[ri, 0]
        x1 = fparams_ref[ri, 1]
        bin_h = fparams_ref[ri, 2]
        bin_w = fparams_ref[ri, 3]
        h = fparams_ref[ri, 4]
        w = fparams_ref[ri, 5]

        a_y = _build_interp(y1, bin_h, h, py.astype(jnp.float32), out_size, sr, PATCH)
        a_x = _build_interp(x1, bin_w, w, px.astype(jnp.float32), out_size, sr, PATCH)

        patch = patch_ref[slot].astype(jnp.float32)
        # tmp[p, w*c] = A_y @ patch
        tmp = jnp.dot(a_y, patch.reshape(PATCH, PATCH * c), preferred_element_type=jnp.float32)
        tmp = tmp.reshape(out_size, PATCH, c)
        # out[p, q, c] = sum_w a_x[q, w] tmp[p, w, c]
        out = jax.lax.dot_general(
            a_x, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [q, p, c]
        out_ref[slot] = jnp.transpose(out, (1, 0, 2)).astype(out_ref.dtype)


def multiscale_roi_align_pallas(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: Sequence[float],
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same API/semantics as `multiscale_roi_align` (torchvision aligned=False)."""
    n = rois.shape[0]
    c = feats[0].shape[-1]
    levels = fpn_level_assignment(rois, num_levels=len(feats))

    hs = jnp.asarray([f.shape[0] for f in feats], jnp.float32)[levels]
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.float32)[levels]
    # Padded level extents: multiples of 8 and >= PATCH, so that the maximum
    # patch origin (extent - PATCH) is itself 8-aligned and an aligned origin
    # always covers the level's right/bottom edge.
    rup = lambda v: -(-max(v, PATCH) // 8) * 8
    hs_pad = jnp.asarray([rup(f.shape[0]) for f in feats], jnp.float32)[levels]
    ws_pad = jnp.asarray([rup(f.shape[1]) for f in feats], jnp.float32)[levels]
    scales = jnp.asarray(spatial_scales, jnp.float32)[levels]

    b = rois.astype(jnp.float32) * scales[:, None]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
    bin_h = jnp.maximum(y2 - y1, 1.0) / output_size

    # Patch origin: one pixel of slack before the first (clamped) sample,
    # clamped so the patch stays in bounds. Levels smaller than PATCH clamp
    # to origin 0 (the DMA may read out of the level's rows; values beyond
    # the extent are masked to zero weight by `in_range`, so content is
    # irrelevant — but the copy must stay legal, hence the max(extent-PATCH,
    # 0) clamp plus PATCH-padding of small levels done below).
    # Mosaic requires HBM slice origins aligned to the sublane tiling (8);
    # rounding DOWN only widens the left slack, and the padded-extent clamp
    # keeps alignment while guaranteeing right/bottom-edge coverage.
    py = jnp.clip(jnp.floor(jnp.clip(y1, 0.0, None)) - 1, 0, hs_pad - PATCH).astype(jnp.int32)
    px = jnp.clip(jnp.floor(jnp.clip(x1, 0.0, None)) - 1, 0, ws_pad - PATCH).astype(jnp.int32)
    py = (py // 8) * 8
    px = (px // 8) * 8

    iparams = jnp.stack([levels, py, px, jnp.zeros_like(levels)], axis=1)
    fparams = jnp.stack(
        [y1, x1, bin_h, bin_w, hs, ws, jnp.zeros_like(y1), jnp.zeros_like(y1)], axis=1
    )
    # Pad the roi axis to a ROIS_PER_PROGRAM multiple (pad rois are level-0
    # origin-0 no-ops whose outputs are sliced off).
    b = ROIS_PER_PROGRAM
    n_pad = -(-n // b) * b
    if n_pad != n:
        iparams = jnp.pad(iparams, ((0, n_pad - n), (0, 0)))
        fparams = jnp.pad(fparams, ((0, n_pad - n), (0, 0)), constant_values=1.0)

    # Pad pyramid levels to the aligned extents so every PATCH copy is legal.
    dtype = feats[0].dtype
    padded_feats = [
        jnp.pad(
            f,
            ((0, rup(f.shape[0]) - f.shape[0]), (0, rup(f.shape[1]) - f.shape[1]), (0, 0)),
        )
        for f in feats
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (b, output_size, output_size, c),
            lambda r, *_: (r, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((b, PATCH, PATCH, c), dtype),
            pltpu.SemaphoreType.DMA((b,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, out_size=output_size, sr=sampling_ratio),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, output_size, output_size, c), dtype),
        interpret=interpret,
    )(iparams, fparams, *padded_feats)
    return out[:n]
