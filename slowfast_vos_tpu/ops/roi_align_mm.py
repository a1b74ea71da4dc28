"""RoIAlign as batched matrix multiplication — the MXU-native formulation.

Bilinear RoIAlign is separable: for each roi, the pooled output is
`A_y @ feature_map @ A_x^T` where A_y [P, H] / A_x [P, W] are per-roi 1-D
interpolation matrices whose rows average the `sampling_ratio` bilinear taps
of each output bin (weights zero for out-of-range samples, matching the
torchvision border rule implemented in `ops/roi_align.py`).

Why: the gather formulation issues millions of 512-byte random loads that the
TPU serves at a few percent of HBM bandwidth, while this formulation is two
dense matmuls per roi — MXU work that is essentially free at these sizes.
Level assignment is handled by masking each level's A matrices to the rois
assigned there and summing the four per-level results; roi blocks stream
through `lax.map` to bound the [block, P, W, C] temporaries.

Exactness: identical sample positions and weights as the gather version (same
torchvision `aligned=False` semantics) — verified to float tolerance in
tests/test_ops_roi_align.py.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from slowfast_vos_tpu.ops.roi_align import fpn_level_assignment, multiscale_roi_align


def _interp_matrix_1d(starts, bins, extent: int, out_size: int, sr: int, dtype):
    """A [N, out_size, extent] averaging the sr bilinear taps per bin.

    starts: [N] roi start coordinate (level scale); bins: [N] bin size.
    """
    n = starts.shape[0]
    s = out_size * sr
    steps = jnp.arange(s, dtype=jnp.float32) + 0.5
    coords = starts[:, None] + steps[None, :] * (bins / sr)[:, None]  # [N, S]
    in_range = (coords >= -1.0) & (coords <= extent)
    c = jnp.clip(coords, 0.0, extent - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    k = jnp.arange(extent, dtype=jnp.float32)
    is0 = k[None, None, :] == c0[:, :, None]
    is1 = k[None, None, :] == jnp.minimum(c0 + 1, extent - 1)[:, :, None]
    a = is0 * (1.0 - frac)[:, :, None] + is1 * frac[:, :, None]
    a = a * in_range[:, :, None]
    # average the sr taps of each bin
    a = a.reshape(n, out_size, sr, extent).mean(axis=2)
    return a.astype(dtype)


def multiscale_roi_align_mm(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: Sequence[float],
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_block: int = 128,
) -> jnp.ndarray:
    """Drop-in replacement for `multiscale_roi_align` (same API/semantics)."""
    n = rois.shape[0]
    c = feats[0].shape[-1]
    levels = fpn_level_assignment(rois, num_levels=len(feats))

    nb = -(-n // roi_block)
    pad = nb * roi_block - n
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    levels_p = jnp.pad(levels, ((0, pad),), constant_values=-1)
    rois_b = rois_p.reshape(nb, roi_block, 4)
    levels_b = levels_p.reshape(nb, roi_block)

    dtype = feats[0].dtype

    def block(args):
        rb, lb = args  # [B,4], [B]
        out = jnp.zeros((roi_block, output_size, output_size, c), jnp.float32)
        for li, (feat, scale) in enumerate(zip(feats, spatial_scales)):
            h, w = feat.shape[:2]
            b = rb.astype(jnp.float32) * scale
            x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
            bin_h = jnp.maximum(y2 - y1, 1.0) / output_size
            sel = (lb == li).astype(jnp.float32)
            a_y = _interp_matrix_1d(y1, bin_h, h, output_size, sampling_ratio, dtype)
            a_x = _interp_matrix_1d(x1, bin_w, w, output_size, sampling_ratio, dtype)
            a_y = a_y * sel[:, None, None].astype(dtype)
            # tmp[b,p,w,c] = sum_h a_y[b,p,h] feat[h,w,c]
            tmp = jax.lax.dot_general(
                a_y,
                feat.reshape(h, w * c),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(roi_block, output_size, w, c)
            # out[b,p,q,c] = sum_w a_x[b,q,w] tmp[b,p,w,c]
            part = jax.lax.dot_general(
                a_x.astype(jnp.float32),
                tmp,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [B, Q, P, C]
            out = out + jnp.transpose(part, (0, 2, 1, 3))
        return out

    pooled = jax.lax.map(block, (rois_b, levels_b))
    pooled = pooled.reshape(nb * roi_block, output_size, output_size, c)[:n]
    return pooled.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _msra_mmgrad(feats, rois, spatial_scales, output_size, sampling_ratio):
    return multiscale_roi_align(
        list(feats), rois, spatial_scales,
        output_size=output_size, sampling_ratio=sampling_ratio,
    )


def _msra_mmgrad_fwd(feats, rois, spatial_scales, output_size, sampling_ratio):
    out = _msra_mmgrad(feats, rois, spatial_scales, output_size, sampling_ratio)
    return out, (feats, rois)


def _msra_mmgrad_bwd(spatial_scales, output_size, sampling_ratio, res, g):
    feats, rois = res
    levels = fpn_level_assignment(rois, num_levels=len(feats))
    # Native-dtype (bf16) MXU dots on TPU; the CPU dot thunk does not
    # implement bf16 x bf16 -> f32, so elsewhere the dots run in f32.
    gdt = g.dtype if jax.default_backend() in ("tpu", "axon") else jnp.float32
    grads = []
    for li, (f, scale) in enumerate(zip(feats, spatial_scales)):
        h, w, _ = f.shape
        b = rois.astype(jnp.float32) * scale
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        bin_w = jnp.maximum(x2 - x1, 1.0) / output_size
        bin_h = jnp.maximum(y2 - y1, 1.0) / output_size
        a_y = _interp_matrix_1d(y1, bin_h, h, output_size, sampling_ratio, gdt)
        a_x = _interp_matrix_1d(x1, bin_w, w, output_size, sampling_ratio, gdt)
        # A roi contributes only to its assigned level: zeroing its A_y rows
        # zeroes its whole outer product.
        a_y = jnp.where((levels == li)[:, None, None], a_y, 0)
        # u[n, h, q, c] = sum_p a_y[n, p, h] g[n, p, q, c]
        u = jax.lax.dot_general(
            a_y, g.astype(gdt),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(gdt)
        # grad[h, w, c] = sum_{n,q} u[n, h, q, c] a_x[n, q, w]
        gl = jax.lax.dot_general(
            u, a_x,
            dimension_numbers=(((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [h, c, w]
        grads.append(jnp.transpose(gl, (0, 2, 1)).astype(f.dtype))
    return tuple(grads), jnp.zeros_like(rois)


_msra_mmgrad.defvjp(_msra_mmgrad_fwd, _msra_mmgrad_bwd)


def multiscale_roi_align_mmgrad(
    feats: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: Sequence[float],
    *,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """`multiscale_roi_align` (exact gather FORWARD) with a custom VJP whose
    feature gradient is the separable dense-matmul TRANSPOSE of the same
    linear map: grad_feat = sum_rois A_y^T @ g @ A_x, per level, computed as
    two batched dot_generals.

    Why: pooling is linear in the features, so autodiff of the gather form
    yields scatter-adds — 8 x ~3.5 ms/step on v5e (the single largest cost
    of the training step, device trace), served at a few percent of HBM
    bandwidth. The transpose-as-matmul form is the SAME gradient (identical
    taps/weights/borders as `_interp_matrix_1d`, parity-tested against the
    gather autodiff) as dense MXU work. Gradients w.r.t. roi coordinates
    are 0, matching torchvision's non-differentiable-in-coords roi_align
    (the reference's training relies on this; the pipeline also cuts them
    with stop_gradient — train/train_step.py).
    """
    return _msra_mmgrad(
        tuple(feats), rois, tuple(spatial_scales), output_size, sampling_ratio
    )
