"""Jittable fixed-shape NMS for TPU.

Replaces `torchvision.ops.nms` / `batched_nms` (C++/CUDA), which the reference
uses inside RPN proposal filtering and RoI-head postprocessing (SURVEY.md §2b).

TPU constraints shape the design:
* no dynamic output shapes — we return a keep *mask* plus a score-sorted order,
  and callers take a static top-k afterwards;
* suppression is inherently sequential in the worst case, so we run it as a
  blocked sweep: sort by score, partition into blocks of size B, and process
  blocks sequentially with `lax.scan`, doing all O(B·N) suppression work of a
  block as dense vector ops on the VPU. This is ceil(N/B) sequential steps
  instead of N.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from slowfast_vos_tpu.ops.boxes import box_iou

NEG_INF = -1e10


def _nms_fixpoint(sboxes, svalid, iou_threshold):
    """Exact greedy NMS on score-sorted boxes via fixpoint iteration.

    keep_{t+1}[i] = valid[i] & !any_{j<i}(keep_t[j] & iou[j,i] > thr)
    has the greedy solution as its unique fixpoint (induction over the sorted
    prefix), and converges in one step per level of the suppression DAG —
    a handful of dense [N,N] mask-matvec iterations instead of the O(N)
    sequential scalar loop. Memory: one [N,N] boolean matrix.
    """
    n = sboxes.shape[0]
    iou = box_iou(sboxes, sboxes)
    earlier = jnp.tril(jnp.ones((n, n), bool), k=-1)  # earlier[r, c] = (c < r)
    # m[j, i] = (j < i) & overlap: candidate i is suppressed by any kept
    # earlier box j.
    m = (iou > iou_threshold) & earlier.T
    m = m & svalid[:, None] & svalid[None, :]

    def body(state):
        keep, _changed = state
        suppressed = (m & keep[:, None]).any(axis=0)
        new_keep = svalid & ~suppressed
        return new_keep, jnp.any(new_keep != keep)

    def cond(state):
        return state[1]

    keep0 = svalid
    keep, _ = jax.lax.while_loop(cond, body, (keep0, jnp.asarray(True)))
    return keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "block_size", "algorithm"))
def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    *,
    iou_threshold: float = 0.5,
    block_size: int = 128,
    algorithm: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Non-maximum suppression with static shapes.

    Args:
      boxes: [N, 4] XYXY.
      scores: [N].
      valid: optional [N] bool; invalid entries are never kept.
      algorithm: 'fixpoint' (dense [N,N] iteration, fastest for N up to a few
        thousand), 'blocked' (O(N) sequential scan sweep, bounded memory), or
        'auto' (fixpoint for N <= 6144).
    Returns:
      (keep, order): `keep` is a [N] bool mask over the ORIGINAL index space;
      `order` is the score-descending permutation of indices (useful for a
      subsequent static top-k of kept boxes).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    eff_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-eff_scores)
    sboxes = boxes[order]
    svalid = eff_scores[order] > NEG_INF / 2

    if algorithm == "fixpoint" or (algorithm == "auto" and n <= 6144):
        alive = _nms_fixpoint(sboxes, svalid, iou_threshold)
        keep = jnp.zeros((n,), bool).at[order].set(alive)
        return keep, order

    nblocks = -(-n // block_size)
    pad = nblocks * block_size - n
    if pad:
        sboxes = jnp.concatenate([sboxes, jnp.zeros((pad, 4), sboxes.dtype)], 0)
        svalid = jnp.concatenate([svalid, jnp.zeros((pad,), bool)], 0)

    blocks = sboxes.reshape(nblocks, block_size, 4)
    bvalid = svalid.reshape(nblocks, block_size)

    def process_block(alive, inputs):
        """alive: [nblocks*B] keep-so-far mask. Resolve one block, then use its
        survivors to suppress everything after it."""
        bidx, bboxes, bval = inputs
        start = bidx * block_size
        block_alive = jax.lax.dynamic_slice(alive, (start,), (block_size,)) & bval

        # Intra-block sequential resolution: B small, dense [B,B] IoU once.
        iou_bb = box_iou(bboxes, bboxes)

        def intra(i, keep):
            sup = (iou_bb[i] > iou_threshold) & keep[i]
            keep = keep & ~(sup & (jnp.arange(block_size) > i))
            return keep

        block_alive = jax.lax.fori_loop(0, block_size, intra, block_alive)

        # Suppress all later boxes against this block's survivors.
        iou_all = box_iou(sboxes, bboxes)  # [nblocks*B, B]
        suppressed = jnp.any((iou_all > iou_threshold) & block_alive[None, :], axis=1)
        later = jnp.arange(alive.shape[0]) >= start + block_size
        alive = alive & ~(suppressed & later)
        alive = jax.lax.dynamic_update_slice(alive, block_alive, (start,))
        return alive, None

    alive0 = svalid
    alive, _ = jax.lax.scan(
        process_block, alive0, (jnp.arange(nblocks), blocks, bvalid)
    )
    alive = alive[:n]
    # Map back to original order.
    keep = jnp.zeros((n,), bool).at[order].set(alive)
    return keep, order


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    *,
    iou_threshold: float = 0.5,
    block_size: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick: boxes in different
    categories (FPN levels or class labels) never overlap, matching
    torchvision's `batched_nms` semantics."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(
        shifted, scores, valid, iou_threshold=iou_threshold, block_size=block_size
    )


def top_k_after_nms(keep, order, scores, k):
    """Static top-k of kept entries, score-descending. Returns (indices [k],
    valid [k]) into the original index space; invalid slots point at index 0.
    If fewer than k candidates exist, trailing slots are invalid."""
    eff = jnp.where(keep, scores, NEG_INF)
    kk = min(k, eff.shape[0])
    top_scores, top_idx = jax.lax.top_k(eff, kk)
    if kk < k:
        top_idx = jnp.concatenate([top_idx, jnp.zeros((k - kk,), top_idx.dtype)])
        top_scores = jnp.concatenate([top_scores, jnp.full((k - kk,), NEG_INF)])
    return top_idx, top_scores > NEG_INF / 2
