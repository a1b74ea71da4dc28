"""Anchor/proposal-to-ground-truth matching and balanced sampling, jittable.

Fixed-shape re-implementation of torchvision's `Matcher` and
`BalancedPositiveNegativeSampler` (consumed by the reference through RPN and
RoIHeads, `code/helpers/model.py:238,346`). Ground truth is padded to a static
maximum with a validity mask; sampling uses `jax.random` so the seed-63
determinism discipline of the reference (`code/train.py:30-37`) holds by
construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BELOW_LOW = -1
BETWEEN = -2


@functools.partial(jax.jit, static_argnames=("high_threshold", "low_threshold", "allow_low_quality"))
def match_to_gt(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    *,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality: bool,
) -> jnp.ndarray:
    """Match each candidate to a gt index, or BELOW_LOW / BETWEEN.

    Args:
      iou: [num_candidates, num_gt] IoU matrix.
      gt_valid: [num_gt] bool mask for padded gt slots.
    Returns:
      [num_candidates] int32 matches.
    """
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched_vals = iou.max(axis=1)
    matches = iou.argmax(axis=1).astype(jnp.int32)
    out = jnp.where(matched_vals < low_threshold, BELOW_LOW, matches)
    out = jnp.where(
        (matched_vals >= low_threshold) & (matched_vals < high_threshold), BETWEEN, out
    )
    if allow_low_quality:
        # For each gt, every candidate achieving that gt's best IoU (ties incl.)
        # is restored to its argmax match — torchvision's low-quality rule
        # (`Matcher.set_low_quality_matches_`), INCLUDING its quirk that a gt
        # whose best IoU is 0 restores every zero-overlap candidate (torch has
        # no >0 guard; verified by the differential test in
        # tests/test_torch_parity.py).
        best_per_gt = iou.max(axis=0)  # [num_gt]
        is_best = (iou == best_per_gt[None, :]) & gt_valid[None, :]
        restore = is_best.any(axis=1)
        out = jnp.where(restore, matches, out)
    return out


def sample_balanced(
    key: jax.Array,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    *,
    batch_size: int,
    positive_fraction: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly pick up to `batch_size*positive_fraction` positives and fill the
    remainder with negatives. Returns (pos_mask, neg_mask) with static shapes.

    Exact-count random subset selection without dynamic shapes: assign random
    priorities, take the top-k among eligible entries, then mask by how many we
    actually want (which depends on the traced count of positives).
    """
    n = positive.shape[0]
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(positive.sum(), max_pos)
    num_neg = jnp.minimum(negative.sum(), batch_size - num_pos)

    kp, kn = jax.random.split(key)

    def pick(k, mask, count):
        pri = jnp.where(mask, jax.random.uniform(k, (n,)), -1.0)
        order = jnp.argsort(-pri)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        return mask & (rank < count)

    return pick(kp, positive, num_pos), pick(kn, negative, num_neg)
