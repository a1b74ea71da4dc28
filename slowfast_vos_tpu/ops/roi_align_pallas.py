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
timing — scripts/profile_roialign.py): 89 ms vs 225 ms for the gather
formulation (was 114 ms before the matmuls were TIER-sized: slicing the A
matrices and patch to the roi's DMA tier drops only exact-zero weight
columns and cuts the dominant matmul's K,N up to (56/24)^2 = 5.4x). Each
roi fetches the SMALLEST tier patch (24/40/56 px) that covers its sample
span at its assigned level (DMA-only floor measured at 38 ms), and the
interp matrices are precomputed in XLA. The remaining wall is MXU compute:
the per-roi [7,tier]@[tier,tier*C] matmul's M=7 occupies 7 of 128 systolic
rows — the structural floor of a per-roi separable formulation. Two
variants that tried to break it measured WORSE and were discarded:
cross-program double-buffering (prefetch the next program's patches during
compute) hit 91 ms — with 4 rois/program the up-front async DMAs already
overlap compute — and a block-diagonal form (tier-sort rois so each
program's 4 share a tier, stack their A_y blocks into a [4*out, 4*tier]
LHS over a strided patch scratch, raising the row matmul's M from 7 to 28)
hit 93-94 ms: it serializes all 4 DMA waits before one matmul, losing the
per-slot DMA/compute overlap, and pays the LHS assembly — together
cancelling the occupancy win. ROIS_PER_PROGRAM=8 (halving grid steps to
amortize per-program overhead) measured 162 ms — ~2x WORSE: the per-slot
scratch alone is then 8 x 56x56x256x2B = 12.9 MB of the core's ~16 MB
VMEM, strangling the double-buffered output pipeline; 4 rois/program
(6.4 MB scratch) remains the tuned optimum.
THIS KERNEL is the production inference path for the 7x7 proposal pool
(`Pipeline(pallas_pool7=True)`, the TPU default). The gather form remains
the default for the mask-branch 14x14 pool, training (differentiability),
and CPU.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slowfast_vos_tpu.ops.roi_align import fpn_level_assignment

# Feature-pixel patch side: covers the canonical-level roi extents (<= ~44 px
# at any level for DAVIS-scale canvases) plus the up-to-7px origin alignment
# slack. Multiple of 8 (sublane tiling).
PATCH = 56

# DMA size tiers: each roi copies the smallest tier patch that covers its
# clamped sample span (rows/cols beyond a roi's tier are never referenced by
# its interpolation weights, computed host-side in `_roi_tiers`). Must end
# with PATCH; multiples of 8.
TIERS = (24, 40, PATCH)


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
    iparams_ref,  # SMEM int32 [N, 4]: level, py, px, tier index
    ay_ref,  # VMEM [N, 8|16, PATCH]: all rois' row-interp matrices (resident)
    ax_ref,  # VMEM [N, 8|16, PATCH]: all rois' col-interp matrices (resident)
    f0, f1, f2, f3,  # HBM level features [H_l, W_l, C]
    out_ref,  # VMEM [B, out, out, C]
    patch_ref,  # VMEM scratch [B, PATCH, PATCH, C]
    sem,  # DMA semaphores [B]
    *,
    out_size: int,
):
    """B rois per program: issue all B patch DMAs up front (they pipeline in
    the DMA engine), then compute each pooled output as it completes —
    amortizing the per-grid-step overhead that bound the 1-roi/program
    version. The interpolation matrices are PRECOMPUTED vectorized in XLA
    and resident in VMEM for the whole call, so the body is just two MXU
    matmuls per roi. Each roi copies only its
    TIER-sized sub-patch; its weights never reference rows/cols beyond the
    tier, so the stale scratch content there is multiplied by exact zeros —
    the first grid step zeroes the scratch once so that content is finite
    (0 * NaN would poison the matmul)."""
    r = pl.program_id(0)
    levels = (f0, f1, f2, f3)
    b = ROIS_PER_PROGRAM

    @pl.when(r == 0)
    def _():
        patch_ref[...] = jnp.zeros_like(patch_ref)

    def dma(slot):
        ri = r * b + slot
        lv = iparams_ref[ri, 0]
        tr = iparams_ref[ri, 3]
        py = pl.multiple_of(iparams_ref[ri, 1], 8)
        px = pl.multiple_of(iparams_ref[ri, 2], 8)
        for li, src in enumerate(levels):
            for ti, tsize in enumerate(TIERS):
                @pl.when((lv == li) & (tr == ti))
                def _():
                    pltpu.make_async_copy(
                        src.at[pl.ds(py, tsize), pl.ds(px, tsize), :],
                        patch_ref.at[slot, pl.ds(0, tsize), pl.ds(0, tsize), :],
                        sem.at[slot],
                    ).start()

    for slot in range(b):
        dma(slot)

    c = patch_ref.shape[-1]
    for slot in range(b):
        ri = r * b + slot
        tr = iparams_ref[ri, 3]
        # Size-matched semaphore wait per tier (the wait is byte-counted),
        # then TIER-SIZED matmuls: a roi's interp weights never reference
        # rows/cols beyond its tier, so slicing both the patch and the A
        # matrices to the tier drops only exact zeros — and cuts the
        # dominant [out, tsize] @ [tsize, tsize*c] matmul's K and N by up to
        # (PATCH/24)^2 = 5.4x for the smallest (most common) tier.
        # Matmuls run in the FEATURE dtype (bf16 on TPU): a native-dtype MXU
        # pass instead of upcasting the whole patch to f32 and paying the
        # multi-pass f32 MXU decomposition. Accumulation stays f32 via
        # preferred_element_type; bf16 interp weights cost ~0.4% relative —
        # inside the bf16 pipeline's own noise (f32 inputs keep f32 weights,
        # so interpret-mode parity tests are exact).
        dt = patch_ref.dtype
        for ti, tsize in enumerate(TIERS):
            @pl.when(tr == ti)
            def _(tsize=tsize):
                pltpu.make_async_copy(
                    f0.at[pl.ds(0, tsize), pl.ds(0, tsize), :],
                    patch_ref.at[slot, pl.ds(0, tsize), pl.ds(0, tsize), :],
                    sem.at[slot],
                ).wait()
                patch = patch_ref[slot, :tsize, :tsize, :]
                # tmp[p, w*c] = A_y @ patch
                tmp = jnp.dot(
                    ay_ref[ri, :out_size, :tsize],
                    patch.reshape(tsize, tsize * c),
                    preferred_element_type=jnp.float32,
                )
                tmp = tmp.reshape(out_size, tsize, c).astype(dt)
                # out[p, q, c] = sum_w a_x[q, w] tmp[p, w, c]
                out = jax.lax.dot_general(
                    ax_ref[ri, :out_size, :tsize],
                    tmp,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [q, p, c]
                out_ref[slot] = jnp.transpose(out, (1, 0, 2)).astype(out_ref.dtype)


def _rup(v: int) -> int:
    """Padded level extent: multiple of 8 and >= PATCH, so that the maximum
    patch origin (extent - PATCH) is itself 8-aligned and an aligned origin
    always covers the level's right/bottom edge."""
    return -(-max(v, PATCH) // 8) * 8


def _roi_prep(
    rois: jnp.ndarray,
    level_hws: Sequence[tuple[int, int]],
    spatial_scales: Sequence[float],
    output_size: int,
    sampling_ratio: int,
    dtype,
):
    """Vectorized per-roi prep shared by the per-frame and whole-clip entry
    points: FPN level assignment, 8-aligned patch origin, DMA size tier, and
    the two interpolation matrices. rois: [M, 4] -> (iparams [M, 4] int32
    (level, py, px, tier), a_y, a_x [M, out_rows, PATCH])."""
    levels = fpn_level_assignment(rois, num_levels=len(level_hws))

    hs = jnp.asarray([h for h, _ in level_hws], jnp.float32)[levels]
    ws = jnp.asarray([w for _, w in level_hws], jnp.float32)[levels]
    hs_pad = jnp.asarray([_rup(h) for h, _ in level_hws], jnp.float32)[levels]
    ws_pad = jnp.asarray([_rup(w) for _, w in level_hws], jnp.float32)[levels]
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

    # Smallest DMA tier covering the roi's clamped sample span. The largest
    # referenced patch row is floor(clip(max sample coord, 0, extent-1) -
    # origin) + 1, and max sample coord < max(y2, y1+1); rois needing more
    # than the top tier keep the documented edge-clamp tail.
    y2e = jnp.maximum(y2, y1 + 1.0)
    x2e = jnp.maximum(x2, x1 + 1.0)
    need_y = jnp.floor(jnp.minimum(y2e, hs - 1.0) - py.astype(jnp.float32)) + 2.0
    need_x = jnp.floor(jnp.minimum(x2e, ws - 1.0) - px.astype(jnp.float32)) + 2.0
    need = jnp.maximum(need_y, need_x)
    tiers = sum(
        (need > float(tsize)).astype(jnp.int32) for tsize in TIERS[:-1]
    )

    iparams = jnp.stack([levels, py, px, tiers], axis=1)

    # Interpolation matrices for ALL rois, built once as one fused vectorized
    # XLA op (vs per-roi inside the kernel, where the tiny-vector VPU work
    # serialized); out rows padded to the sublane multiple, cast to the
    # feature dtype so the kernel matmul is a single native MXU pass.
    out_rows = -(-output_size // 8) * 8
    build = jax.vmap(
        lambda st, bs, ext, org: _build_interp(
            st, bs, ext, org, output_size, sampling_ratio, PATCH
        )
    )
    pad_rows = ((0, 0), (0, out_rows - output_size), (0, 0))
    a_y = jnp.pad(build(y1, bin_h, hs, py.astype(jnp.float32)), pad_rows).astype(dtype)
    a_x = jnp.pad(build(x1, bin_w, ws, px.astype(jnp.float32)), pad_rows).astype(dtype)
    return iparams, a_y, a_x


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
    dtype = feats[0].dtype
    out_rows = -(-output_size // 8) * 8
    iparams, a_y, a_x = _roi_prep(
        rois, [f.shape[:2] for f in feats], spatial_scales, output_size, sampling_ratio, dtype
    )

    # Pad the roi axis to a ROIS_PER_PROGRAM multiple (pad rois are level-0
    # origin-0 no-ops whose outputs are sliced off).
    b = ROIS_PER_PROGRAM
    n_pad = -(-n // b) * b
    if n_pad != n:
        iparams = jnp.pad(iparams, ((0, n_pad - n), (0, 0)))
        a_y = jnp.pad(a_y, ((0, n_pad - n), (0, 0), (0, 0)))
        a_x = jnp.pad(a_x, ((0, n_pad - n), (0, 0), (0, 0)))

    # Pad pyramid levels to the aligned extents so every PATCH copy is legal.
    padded_feats = [
        jnp.pad(
            f,
            ((0, _rup(f.shape[0]) - f.shape[0]), (0, _rup(f.shape[1]) - f.shape[1]), (0, 0)),
        )
        for f in feats
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // b,),
        in_specs=[
            # The full interp-matrix arrays live in VMEM for the whole call
            # (~1 MB at production shape); the constant index map hoists
            # their copy out of the grid loop.
            pl.BlockSpec((n_pad, out_rows, PATCH), lambda r, *_: (0, 0, 0)),
            pl.BlockSpec((n_pad, out_rows, PATCH), lambda r, *_: (0, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
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
        functools.partial(_kernel, out_size=output_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, output_size, output_size, c), dtype),
        interpret=interpret,
    )(iparams, a_y, a_x, *padded_feats)
    return out[:n]


def multiscale_roi_align_pallas_clip(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: Sequence[float],
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
    rois_per_call: int = 1024,
) -> jnp.ndarray:
    """Whole-clip multiscale RoIAlign: feats are 4 pyramid levels
    [T, H_l, W_l, C]; rois [T, N, 4] in canvas coordinates. Returns
    [T, N, out, out, C], bit-identical per frame to
    `multiscale_roi_align_pallas(feats[:, t], rois[t], ...)`.

    Runs the UNMODIFIED per-frame `_kernel`: each level is padded to aligned
    extents and its frame axis flattened into rows (a free reshape in the
    row-major layout), and each roi's row origin carries its frame offset —
    so per-frame feature slicing disappears and ONE prep pass serves the
    whole clip. The per-roi prep runs once vectorized over T*N rois; the
    kernel is invoked in `rois_per_call` chunks because the scalar-prefetch
    iparams live in SMEM (~64 KB observed capacity on v5e: [8000, 5] int32
    failed to compile; 2048 x 4 = 32 KB fits with headroom) and the chunk's
    interp matrices stay whole-block VMEM-resident (3.7 MB at 2048 rois).

    MEASURED SLOWER THAN THE PER-FRAME lax.map FORM — NOT USED IN
    PRODUCTION. At 32x1000 rois on v5e: wall 98.9 vs 85.0 ms; device-trace
    totals 73.5 vs ~66 ms, with the per-1024-roi kernel call itself at
    2.15 vs 1.74 ms. Root cause (visible in the HLO buffer annotations):
    when the per-frame form slices one frame's pyramid out of the clip
    (~44 MB bf16), XLA stages the sliced level arrays in VMEM (S(1)), so
    the kernel's patch DMAs are VMEM->VMEM; this form's frame-flattened
    levels are GB-scale and must stay HBM-resident, so every patch DMA
    pays HBM latency. The ~4 ms/clip the per-frame form spends on
    dynamic-slice copies buys ~13 ms of faster DMAs. Two earlier variants
    measured worse still: (a) a kernel indexing 4-d [T, H, W, C] operands
    with a dynamic frame index in the DMA, and (b) packing the per-roi
    scalars into one int32 to fit more rois per call — each added ~16 ms
    (~2 us/program): the kernel is scalar-core bound at DMA-issue, so any
    extra scalar work lands on the critical path. Kept (with the interpret
    parity test) as the measured record of the whole-clip design point."""
    t, n = rois.shape[:2]
    m = t * n
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    out_rows = -(-output_size // 8) * 8

    iparams, a_y, a_x = _roi_prep(
        rois.reshape(m, 4),
        [f.shape[1:3] for f in feats],
        spatial_scales,
        output_size,
        sampling_ratio,
        dtype,
    )
    # Fold each roi's frame into its row origin against the FLATTENED
    # (frame-into-rows) level arrays the kernel receives. The fold keeps
    # iparams' (level, py, px, tier) column order — `_kernel` reads it
    # unchanged.
    hp = jnp.asarray([_rup(f.shape[1]) for f in feats], jnp.int32)[iparams[:, 0]]
    frame = jnp.repeat(jnp.arange(t, dtype=jnp.int32), n)
    iparams = iparams.at[:, 1].add(frame * hp)

    b = ROIS_PER_PROGRAM
    k = min(-(-rois_per_call // b) * b, -(-m // b) * b)
    m_pad = -(-m // k) * k
    if m_pad != m:
        iparams = jnp.pad(iparams, ((0, m_pad - m), (0, 0)))
        a_y = jnp.pad(a_y, ((0, m_pad - m), (0, 0), (0, 0)))
        a_x = jnp.pad(a_x, ((0, m_pad - m), (0, 0), (0, 0)))

    # Pad each level to aligned extents, then flatten frames into rows: the
    # row-major layout makes the [T, Hp, Wp, C] -> [T*Hp, Wp, C] reshape
    # free, and the per-roi row origins above point into the flat array.
    padded_feats = [
        jnp.pad(
            f,
            (
                (0, 0),
                (0, _rup(f.shape[1]) - f.shape[1]),
                (0, _rup(f.shape[2]) - f.shape[2]),
                (0, 0),
            ),
        ).reshape(t * _rup(f.shape[1]), _rup(f.shape[2]), c)
        for f in feats
    ]

    def call(ip, ay, ax):
        mk = ip.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mk // b,),
            in_specs=[
                pl.BlockSpec((mk, out_rows, PATCH), lambda r, *_: (0, 0, 0)),
                pl.BlockSpec((mk, out_rows, PATCH), lambda r, *_: (0, 0, 0)),
            ]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
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
        return pl.pallas_call(
            functools.partial(_kernel, out_size=output_size),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mk, output_size, output_size, c), dtype),
            interpret=interpret,
        )(ip, ay, ax, *padded_feats)

    if m_pad <= k:
        out = call(iparams, a_y, a_x)
    else:
        out = jnp.concatenate(
            [
                call(iparams[i : i + k], a_y[i : i + k], a_x[i : i + k])
                for i in range(0, m_pad, k)
            ]
        )
    return out[:m].reshape(t, n, output_size, output_size, c)
