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


def sample_balanced_indices(
    key: jax.Array,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    *,
    batch_size: int,
    positive_fraction: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`sample_balanced` returning a COMPACT index set instead of full-length
    masks: two `top_k(k <= batch_size)` calls instead of two full argsorts +
    two rank scatters, and the caller computes its losses on
    `max_pos + batch_size` rows instead of all n — over the ~257k RPN anchors
    the mask form cost ~12 ms/step (profiled: sort.14/15 + rank-scatter
    fusions + full-anchor encode/smooth-l1/BCE).

    Per class, the k largest of an i.i.d. uniform draw (non-members pinned to
    -1) are a uniform random subset — the same sampling distribution as
    `sample_balanced` (torchvision's BalancedPositiveNegativeSampler,
    `_utils.py`), with independent draws per class.

    Returns (idx [P + B], is_pos [P + B], valid [P + B]) with
    P = min(max_pos, n), B = min(batch_size, n); `idx` rows where
    `valid` is False are arbitrary (-1-priority picks) and must be masked by
    the caller.
    """
    n = positive.shape[0]
    max_pos = min(int(batch_size * positive_fraction), n)
    bsz = min(batch_size, n)
    num_pos = jnp.minimum(positive.sum(), max_pos)
    num_neg = jnp.minimum(negative.sum(), batch_size - num_pos)

    kp, kn = jax.random.split(key)
    up = jax.random.uniform(kp, (n,))
    un = jax.random.uniform(kn, (n,))
    _, pos_idx = jax.lax.top_k(jnp.where(positive, up, -1.0), max_pos)
    _, neg_idx = jax.lax.top_k(jnp.where(negative, un, -1.0), bsz)
    idx = jnp.concatenate([pos_idx, neg_idx])
    valid = jnp.concatenate(
        [jnp.arange(max_pos) < num_pos, jnp.arange(bsz) < num_neg]
    )
    is_pos = jnp.concatenate(
        [jnp.ones((max_pos,), bool), jnp.zeros((bsz,), bool)]
    )
    return idx, is_pos, valid
