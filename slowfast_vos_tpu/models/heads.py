"""RoI heads: box classification/regression + mask prediction, fixed-shape.

TPU-native equivalent of torchvision's `RoIHeads` (+ the swapped-in
`FastRCNNPredictor`/`MaskRCNNPredictor` heads the reference installs at
`code/helpers/model.py:12-27`), invoked by the reference per frame at
`model.py:346`. Everything here is static-shape: training samples are gathered
into exactly `box_batch_size_per_image` slots (positives first) with validity
masks; mask training uses a static cap of positives; inference emits exactly
`detections_per_img` detections with a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.layers import Conv1x1MM
from slowfast_vos_tpu.models.matching import match_to_gt, sample_balanced, BELOW_LOW
from slowfast_vos_tpu.models.rpn import smooth_l1
from slowfast_vos_tpu.ops.boxes import box_iou, clip_boxes, decode_boxes, encode_boxes, remove_small_boxes_mask
from slowfast_vos_tpu.ops.nms import batched_nms_mask, top_k_after_nms


class _DenseParams(nn.Module):
    """Parameter holder structurally identical to `nn.Dense` (kernel
    [cin, features] lecun-normal + bias zeros) but returning the weights —
    so `BoxHead` can run its classifier and regressor as ONE concatenated
    matmul with the checkpoint tree of separate Dense layers."""

    features: int
    cin: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.cin, self.features)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self):
        return self.kernel, self.bias


class BoxHead(nn.Module):
    """TwoMLPHead + FastRCNNPredictor: 7x7x256 -> fc1024 -> fc1024 -> cls/reg."""

    num_classes: int
    representation: int = 1024
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):  # [N, 7, 7, C]
        x = pooled.reshape(pooled.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.representation, name="fc6", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.representation, name="fc7", dtype=self.dtype)(x))
        # cls (1024->2) and reg (1024->8) read the same representation; one
        # cout-concatenated matmul (bit-identical per column, tree unchanged)
        # replaces two sliver-of-a-tile dispatches over the [N, 1024] input.
        ck, cb = _DenseParams(self.num_classes, self.representation, name="cls_score")()
        rk, rb = _DenseParams(self.num_classes * 4, self.representation, name="bbox_pred")()
        o = x @ jnp.concatenate([ck, rk], axis=-1).astype(self.dtype)
        o = o + jnp.concatenate([cb, rb]).astype(self.dtype)
        cls, reg = o[:, : self.num_classes], o[:, self.num_classes :]
        return cls.astype(jnp.float32), reg.astype(jnp.float32).reshape(-1, self.num_classes, 4)


class _DeconvMM(nn.Module):
    """2x2/stride-2 transposed conv with nn.ConvTranspose's parameter layout
    but the matmul+depth-to-space compute path of `ops/deconv.py`."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from slowfast_vos_tpu.ops.deconv import deconv2x2_stride2

        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deconv2x2_stride2(x, kernel.astype(x.dtype), bias.astype(x.dtype))


class MaskHead(nn.Module):
    """4x (3x3 conv 256 + relu) -> deconv 2x2/2 + relu -> 1x1 conv -> logits.

    Mirrors torchvision MaskRCNNHeads + MaskRCNNPredictor (hidden 256,
    reference `model.py:23-25`). Input 14x14 rois, output 28x28 logits.
    """

    num_classes: int
    channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled):  # [N, 14, 14, C]
        from slowfast_vos_tpu.ops.deconv import deconv2x2_stride2

        x = pooled.astype(self.dtype)
        for i in range(4):
            x = nn.relu(
                nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], name=f"mask_fcn{i + 1}", dtype=self.dtype)(x)
            )
        # ConvTranspose parameters with the MXU-native matmul+depth-to-space
        # compute path (ops/deconv.py); param layout matches nn.ConvTranspose
        # so checkpoint conversion is unaffected.
        x = nn.relu(_DeconvMM(self.channels, name="conv5_mask", dtype=self.dtype)(x))
        x = Conv1x1MM(self.num_classes, use_bias=True, name="mask_fcn_logits", dtype=self.dtype)(x)
        return x.astype(jnp.float32)  # [N, 28, 28, num_classes]


def _masks_to_sorted_indices(pos_mask, neg_mask, total):
    """Static gather order: positives first, then negatives, then padding.
    lax.top_k breaks ties by lower index, giving a deterministic layout."""
    score = pos_mask.astype(jnp.int32) * 2 + neg_mask.astype(jnp.int32)
    top, idx = jax.lax.top_k(score, total)
    return idx, top == 2, top > 0  # indices, is_positive, valid


def select_training_samples(
    key: jax.Array,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: DetectionConfig,
):
    """torchvision `RoIHeads.select_training_samples` for one image:
    gt boxes are appended to proposals, matched at fg=bg=0.5 (no low-quality),
    then 512 rois sampled at 0.25 positive fraction.

    Returns dict with static [box_batch] arrays: boxes, labels, reg_targets,
    is_pos, valid, matched_gt (index into gt).
    """
    props = jnp.concatenate([proposals, gt_boxes], axis=0)
    pvalid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_iou(props, gt_boxes)
    iou = jnp.where(pvalid[:, None], iou, -1.0)
    matches = match_to_gt(
        iou, gt_valid, high_threshold=cfg.box_fg_iou, low_threshold=cfg.box_bg_iou, allow_low_quality=False
    )
    positive = (matches >= 0) & pvalid
    negative = (matches == BELOW_LOW) & pvalid
    pos_mask, neg_mask = sample_balanced(
        key, positive, negative,
        batch_size=cfg.box_batch_size_per_image,
        positive_fraction=cfg.box_positive_fraction,
    )
    total = min(cfg.box_batch_size_per_image, props.shape[0])
    idx, is_pos, valid = _masks_to_sorted_indices(pos_mask, neg_mask, total)

    boxes = props[idx]
    matched = jnp.clip(matches[idx], 0)
    labels = jnp.where(is_pos, gt_labels[matched], 0)
    reg_targets = encode_boxes(gt_boxes[matched], boxes, cfg.bbox_reg_weights)
    return {
        "boxes": boxes,
        "labels": labels,
        "reg_targets": reg_targets,
        "matched_gt": matched,
        "is_pos": is_pos,
        "valid": valid,
    }


def fastrcnn_loss(class_logits, box_regression, samples):
    """CE over sampled rois + smooth-l1(beta=1/9) on positives / num sampled."""
    labels = samples["labels"]
    valid = samples["valid"]
    num = jnp.maximum(valid.sum(), 1)

    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    cls_loss = jnp.where(valid, ce, 0.0).sum() / num

    reg = jnp.take_along_axis(box_regression, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    bl = smooth_l1(reg - samples["reg_targets"], beta=1.0 / 9.0).sum(-1)
    box_loss = jnp.where(samples["is_pos"], bl, 0.0).sum() / num
    return cls_loss, box_loss


def project_masks_on_boxes(mask_stack, gt_idx, boxes, out_size):
    """Sample gt masks at roi boxes into [R, out, out] binary targets.

    torchvision projects gt masks with roi_align(spatial_scale=1). Bilinear
    RoIAlign is separable, so the projection is computed as two DENSE
    batched matmuls per roi, A_y @ mask[gt] @ A_x^T, with the 1-D
    interpolation matrices of `ops/roi_align_mm` (same taps, borders and
    sr-tap averaging — the 2-D tap mean factorizes into the product of the
    1-D row means). The previous formulation gathered the 4 bilinear taps
    out of the [G, Hc, Wc] canvas mask stack; those 4 gathers were the
    single largest cost of the train step (4 x ~11 ms/step on v5e), while
    the dense form is MXU work over the same planes. Sampling ratio is
    fixed at 2 (torchvision uses adaptive; sub-pixel difference on binary
    targets).
    """
    from slowfast_vos_tpu.ops.roi_align_mm import _interp_matrix_1d

    h, w = mask_stack.shape[-2:]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    sr = 2
    a_y = _interp_matrix_1d(y1, roi_h / out_size, h, out_size, sr, jnp.float32)
    a_x = _interp_matrix_1d(x1, roi_w / out_size, w, out_size, sr, jnp.float32)
    msel = mask_stack[gt_idx].astype(jnp.float32)  # [R, H, W] plane select
    # tmp[r, i, x] = sum_y a_y[r, i, y] msel[r, y, x]
    tmp = jax.lax.dot_general(
        a_y, msel, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # out[r, i, j] = sum_x tmp[r, i, x] a_x[r, j, x]
    return jax.lax.dot_general(
        tmp, a_x, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def maskrcnn_loss(mask_logits, targets, labels, valid):
    """BCE-with-logits of the gt-class channel vs projected gt mask targets,
    mean over all pixels of valid positive rois (torchvision maskrcnn_loss).

    mask_logits: [R, M, M, C]; targets: [R, M, M]; labels/valid: [R]."""
    m = mask_logits.shape[1]
    sel = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None].repeat(m, 1).repeat(m, 2), axis=3
    )[..., 0]
    bce = jnp.maximum(sel, 0) - sel * targets + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    per_roi = bce.mean(axis=(1, 2))
    num = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, per_roi, 0.0).sum() / num


def postprocess_detections_single(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    image_hw,
    cfg: DetectionConfig,
):
    """torchvision `postprocess_detections` for one image, static shapes.

    Returns (boxes [D,4], scores [D], labels [D], valid [D]) with
    D = detections_per_img.
    """
    num_classes = class_logits.shape[-1]
    scores = jax.nn.softmax(class_logits, axis=-1)  # [P, C]
    boxes = decode_boxes(box_regression, proposals[:, None, :], cfg.bbox_reg_weights)  # [P, C, 4]
    boxes = clip_boxes(boxes, image_hw)

    # Drop background column, flatten classes.
    fg_boxes = boxes[:, 1:].reshape(-1, 4)
    fg_scores = scores[:, 1:].reshape(-1)
    fg_labels = jnp.tile(jnp.arange(1, num_classes, dtype=jnp.int32)[None], (proposals.shape[0], 1)).reshape(-1)
    fg_valid = jnp.repeat(prop_valid, num_classes - 1)

    valid = fg_valid & (fg_scores > cfg.box_score_thresh) & remove_small_boxes_mask(fg_boxes, cfg.box_min_size)
    keep, order = batched_nms_mask(fg_boxes, fg_scores, fg_labels, valid, iou_threshold=cfg.box_nms_thresh)
    idx, out_valid = top_k_after_nms(keep, order, fg_scores, cfg.detections_per_img)
    return fg_boxes[idx], fg_scores[idx], fg_labels[idx], out_valid
