"""Region Proposal Network: head, jittable proposal filtering, and losses.

TPU-native equivalent of torchvision's `RegionProposalNetwork`, which the
reference calls frozen and per-frame at `code/helpers/model.py:236-240`. Here
the head runs batched over all clip frames at once; proposal filtering is a
fixed-shape pipeline (per-level top-k -> decode -> clip -> size filter ->
category-NMS over levels -> static top-k) vmapped over frames.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.matching import match_to_gt, sample_balanced_indices, BELOW_LOW
from slowfast_vos_tpu.ops.boxes import box_iou, clip_boxes, decode_boxes, encode_boxes, remove_small_boxes_mask
from slowfast_vos_tpu.ops.nms import nms_mask, top_k_after_nms


class _Conv1x1Params(nn.Module):
    """Parameter holder structurally identical to a 1x1 `nn.Conv` (kernel
    [1, 1, cin, features] lecun-normal + bias zeros, same names/init), but
    returning the weights instead of applying them — so `RPNHead` can run
    its objectness and box-delta heads as ONE cout-concatenated conv while
    keeping the checkpoint tree identical to separate convs."""

    features: int
    cin: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, self.cin, self.features)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self):
        return self.kernel, self.bias


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / 1x1 box-delta heads per FPN level."""

    num_anchors: int = 3
    channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv", dtype=self.dtype)
        a = self.num_anchors
        # The two 1x1 heads read the identical activation with cout 3 and 12
        # — each a sliver of one 128-lane MXU tile dispatched separately.
        # Concatenating their kernels along cout runs them as ONE 256->15
        # conv per level (bit-identical per output channel, checkpoint tree
        # unchanged) and reads the [T, H, W, 256] activation once, not twice.
        ck, cb = _Conv1x1Params(a, self.channels, name="cls_logits")()
        rk, rb = _Conv1x1Params(a * 4, self.channels, name="bbox_pred")()
        wk = jnp.concatenate([ck, rk], axis=-1).astype(self.dtype)
        wb = jnp.concatenate([cb, rb]).astype(self.dtype)
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            # Stay in the compute dtype: consumers cast to f32 only AFTER the
            # per-level top-k gather (filter_proposals) or the sampled-row
            # gather (rpn_loss). bf16 -> f32 casting is exact, and comparisons
            # between bf16 values equal their f32 casts' comparisons, so
            # selection/ordering is bit-identical while the full-anchor
            # flatten relayout moves half the bytes (~5 ms/superchunk of f32
            # copies on the [T,193536,4] P2 deltas, device trace copy.388).
            # dot_general, not a 1x1 conv: see layers.Conv1x1MM (the conv
            # dispatch measured ~5x slower than the equivalent matmul).
            tc = t.astype(self.dtype)
            o = (
                jax.lax.dot_general(
                    tc.reshape(-1, tc.shape[-1]), wk[0, 0], (((1,), (0,)), ((), ()))
                ).reshape(*tc.shape[:-1], wk.shape[-1])
                + wb
            )
            logits.append(o[..., :a])
            deltas.append(o[..., a:].reshape(*o.shape[:-1], a, 4))
        return logits, deltas


@functools.partial(
    jax.jit,
    static_argnames=("image_hw", "pre_nms_top_n", "post_nms_top_n", "nms_thresh", "min_size"),
)
def filter_proposals_single(
    objectness: tuple[jnp.ndarray, ...],
    deltas: tuple[jnp.ndarray, ...],
    anchors: tuple[jnp.ndarray, ...],
    *,
    image_hw: tuple[float, float],
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
):
    """One image. objectness[l]: [H,W,A]; deltas[l]: [H,W,A,4]; anchors[l]: [HWA,4].

    Returns (proposals [post_nms_top_n, 4], scores, valid).

    torchvision's `batched_nms` over FPN levels never lets levels suppress
    each other (the category-offset trick), so the NMS decomposes EXACTLY
    into one independent NMS per level — vmapped here, turning one
    [L*K, L*K] suppression matrix into L [K, K] ones (25x less matrix work
    at eval sizes; this stage was ~16% of device time as a single fused
    NMS)."""
    cand_boxes, cand_scores, cand_valid = [], [], []
    kmax = min(pre_nms_top_n, max(o.size for o in objectness))
    for obj, dlt, anc in zip(objectness, deltas, anchors):
        scores = obj.reshape(-1)
        dl = dlt.reshape(-1, 4)
        k = min(pre_nms_top_n, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        boxes = decode_boxes(dl[top_idx], anc[top_idx])
        boxes = clip_boxes(boxes, image_hw)
        lvalid = remove_small_boxes_mask(boxes, min_size)
        if k < kmax:  # pad small levels so levels vmap together
            boxes = jnp.pad(boxes, ((0, kmax - k), (0, 0)))
            top_scores = jnp.pad(top_scores, (0, kmax - k), constant_values=-jnp.inf)
            lvalid = jnp.pad(lvalid, (0, kmax - k))
        cand_boxes.append(boxes)
        cand_scores.append(top_scores)
        cand_valid.append(lvalid)
    boxes = jnp.stack(cand_boxes)  # [L, K, 4]
    scores = jnp.stack(cand_scores)
    valid = jnp.stack(cand_valid)

    keep, _order = jax.vmap(
        lambda b, s, v: nms_mask(b, s, v, iou_threshold=nms_thresh)
    )(boxes, scores, valid)
    flat_scores = scores.reshape(-1)
    idx, out_valid = top_k_after_nms(
        keep.reshape(-1), None, flat_scores, post_nms_top_n
    )
    return boxes.reshape(-1, 4)[idx], flat_scores[idx], out_valid


def filter_proposals(objectness, deltas, anchors, *, image_hw, cfg: DetectionConfig, training: bool):
    """Proposal filtering for a whole clip. objectness[l]: [T,H,W,A].

    Identical selection to mapping `filter_proposals_single` per frame
    (torchvision `filter_proposals` semantics, `code/helpers/model.py:236-240`
    via the RPN), restructured for the device:

    * per-level top-k + candidate gather + decode/clip/min-size run BATCHED
      over all frames BEFORE the per-frame loop, so the loop carries
      [T, L, K, 4] candidates instead of the full [T, ~257k, 4] head outputs
      (whose in-loop dynamic-slices + relayout copies cost ~10 ms/superchunk,
      device trace copy.388 + dynamic-slice_bitcast_fusion.30);
    * the head outputs stay bf16 until after the gather (exact — see RPNHead);
    * only the fixpoint NMS and the final cross-level top-k stay in the
      sequential per-frame map: the NMS holds an [K, K] IoU matrix per level
      (~100 MB batched across a superchunk) and must not be batched. A
      4-frame vmapped grouping was also measured WORSE (while 35->45 ms —
      lockstep iteration counts).
    """
    pre = cfg.rpn_pre_nms_top_n_train if training else cfg.rpn_pre_nms_top_n_test
    post = cfg.rpn_post_nms_top_n_train if training else cfg.rpn_post_nms_top_n_test
    t = objectness[0].shape[0]
    # Flatten [T,H,W,A(,4)] -> [T,HWA(,4)] batched (the conv outputs are
    # channel-minor tiled with A=3 padded to 128 lanes, so this is a real
    # relayout; doing it per frame cost ~12 ms/superchunk).
    objectness = tuple(o.reshape(t, -1) for o in objectness)
    deltas = tuple(d.reshape(t, -1, 4) for d in deltas)
    kmax = min(pre, max(o.shape[1] for o in objectness))
    cand_boxes, cand_scores, cand_valid = [], [], []
    for obj, dlt, anc in zip(objectness, deltas, anchors):
        k = min(pre, obj.shape[1])
        top_s, top_i = jax.lax.top_k(obj, k)  # [T, k]
        d = jnp.take_along_axis(dlt, top_i[..., None], axis=1).astype(jnp.float32)
        boxes = clip_boxes(decode_boxes(d, anc[top_i]), image_hw)
        lvalid = remove_small_boxes_mask(boxes, cfg.rpn_min_size)
        top_s = top_s.astype(jnp.float32)
        if k < kmax:  # pad small levels so levels stack
            boxes = jnp.pad(boxes, ((0, 0), (0, kmax - k), (0, 0)))
            top_s = jnp.pad(top_s, ((0, 0), (0, kmax - k)), constant_values=-jnp.inf)
            lvalid = jnp.pad(lvalid, ((0, 0), (0, kmax - k)))
        cand_boxes.append(boxes)
        cand_scores.append(top_s)
        cand_valid.append(lvalid)
    boxes = jnp.stack(cand_boxes, axis=1)  # [T, L, K, 4]
    scores = jnp.stack(cand_scores, axis=1)
    valid = jnp.stack(cand_valid, axis=1)

    nms_thresh = cfg.rpn_nms_thresh

    def _nms_one(args):
        b, s, v = args
        # torchvision's `batched_nms` over FPN levels never lets levels
        # suppress each other (category-offset trick) -> one independent NMS
        # per level, vmapped (filter_proposals_single docstring).
        keep, _order = jax.vmap(
            lambda bb, ss, vv: nms_mask(bb, ss, vv, iou_threshold=nms_thresh)
        )(b, s, v)
        flat_s = s.reshape(-1)
        idx, out_valid = top_k_after_nms(keep.reshape(-1), None, flat_s, post)
        return b.reshape(-1, 4)[idx], flat_s[idx], out_valid

    return jax.lax.map(_nms_one, (boxes, scores, valid))


def smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rpn_loss_single(
    key: jax.Array,
    objectness_flat: jnp.ndarray,
    deltas_flat: jnp.ndarray,
    anchors_flat: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: DetectionConfig,
):
    """RPN training loss for one image, torchvision semantics:
    matcher(0.3/0.7, low-quality), 256 samples @ 0.5 positive, BCE objectness
    (mean over sampled) + smooth-l1(beta=1/9) box loss (sum over positives /
    num sampled)."""
    iou = box_iou(anchors_flat, gt_boxes)
    matches = match_to_gt(
        iou,
        gt_valid,
        high_threshold=cfg.rpn_fg_iou,
        low_threshold=cfg.rpn_bg_iou,
        allow_low_quality=True,
    )
    positive = matches >= 0
    negative = matches == BELOW_LOW
    # Compact sampling: the losses touch only the <=256 sampled anchors, so
    # encode/smooth-l1/BCE run on the sampled rows, not all ~257k anchors
    # (torchvision also gathers the sampled subset, rpn.py compute_loss).
    idx, is_pos, valid = sample_balanced_indices(
        key,
        positive,
        negative,
        batch_size=cfg.rpn_batch_size_per_image,
        positive_fraction=cfg.rpn_positive_fraction,
    )
    num_sampled = jnp.maximum(valid.sum(), 1)

    matched_gt = gt_boxes[jnp.clip(matches[idx], 0)]
    reg_targets = encode_boxes(matched_gt, anchors_flat[idx])
    box_l = smooth_l1(deltas_flat[idx] - reg_targets, beta=1.0 / 9.0).sum(-1)
    box_loss = jnp.where(is_pos & valid, box_l, 0.0).sum() / num_sampled

    obj = objectness_flat[idx]
    labels = (is_pos & valid).astype(jnp.float32)
    bce = jnp.maximum(obj, 0) - obj * labels + jnp.log1p(jnp.exp(-jnp.abs(obj)))
    obj_loss = jnp.where(valid, bce, 0.0).sum() / num_sampled
    return obj_loss, box_loss


def rpn_loss(key, objectness, deltas, anchors, gt_boxes, gt_valid, cfg: DetectionConfig):
    """Batched over frames. objectness[l]: [T,H,W,A]; gt_boxes: [T,MAX_GT,4]."""
    t = gt_boxes.shape[0]
    # Head outputs arrive bf16 (RPNHead); the loss math runs in f32 on the
    # sampled rows — casting the flatten here (not in the head) keeps values
    # identical (bf16 -> f32 is exact) at half the relayout traffic.
    obj_flat = jnp.concatenate(
        [o.reshape(t, -1) for o in objectness], axis=1
    ).astype(jnp.float32)
    dlt_flat = jnp.concatenate(
        [d.reshape(t, -1, 4) for d in deltas], axis=1
    ).astype(jnp.float32)
    anc_flat = jnp.concatenate(list(anchors), axis=0)
    keys = jax.random.split(key, t)
    obj_l, box_l = jax.vmap(
        lambda k, o, d, gb, gv: rpn_loss_single(k, o, d, anc_flat, gb, gv, cfg)
    )(keys, obj_flat, dlt_flat, gt_boxes, gt_valid)
    return obj_l.mean(), box_l.mean()
