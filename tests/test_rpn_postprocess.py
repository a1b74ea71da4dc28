"""Targeted tests for RPN proposal filtering and box-head postprocess."""
import numpy as np
import jax
import jax.numpy as jnp

from slowfast_vos_tpu.models.anchors import cell_anchors, fpn_anchors, grid_anchors
from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.heads import postprocess_detections_single
from slowfast_vos_tpu.models.rpn import filter_proposals_single, rpn_loss_single, smooth_l1
from slowfast_vos_tpu.ops.boxes import encode_boxes


def test_cell_anchors_torchvision_values():
    # size 32, ratios (0.5, 1, 2): torchvision rounds sqrt-scaled extents
    a = cell_anchors(32.0)
    np.testing.assert_array_equal(
        a,
        [
            [-23.0, -11.0, 23.0, 11.0],
            [-16.0, -16.0, 16.0, 16.0],
            [-11.0, -23.0, 11.0, 23.0],
        ],
    )


def test_grid_anchors_layout():
    g = grid_anchors((2, 3), stride=4, size=32.0)
    assert g.shape == (2 * 3 * 3, 4)
    # location-major: first three rows share the (0,0) shift
    np.testing.assert_array_equal(g[0], cell_anchors(32.0)[0])
    np.testing.assert_array_equal(g[3] - g[0], [4, 0, 4, 0])  # next x shift


def test_filter_proposals_orders_and_decodes():
    anchors = [jnp.asarray(grid_anchors((4, 4), 8, 32.0))]
    n = anchors[0].shape[0]
    obj = jnp.full((4, 4, 3), -5.0)
    obj = obj.at[2, 2, 1].set(5.0)  # one strong anchor
    deltas = jnp.zeros((4, 4, 3, 4))
    props, scores, valid = filter_proposals_single(
        (obj,), (deltas,), (anchors[0],),
        image_hw=(32.0, 32.0), pre_nms_top_n=16, post_nms_top_n=8,
        nms_thresh=0.7, min_size=1e-3,
    )
    assert bool(valid[0])
    # top proposal = the strong anchor, zero deltas -> the (clipped) anchor box
    want = np.clip(np.asarray(anchors[0]).reshape(4, 4, 3, 4)[2, 2, 1], 0, 32)
    np.testing.assert_allclose(np.asarray(props[0]), want, atol=1e-4)
    # scores descending among valid
    s = np.asarray(scores)[np.asarray(valid)]
    assert (np.diff(s) <= 1e-6).all()


def test_filter_proposals_drops_tiny_boxes():
    anchors = [jnp.asarray(grid_anchors((2, 2), 8, 32.0))]
    obj = jnp.zeros((2, 2, 3))
    # shrink every box to a point: dw=dh=-20 => exp(-20)*w ~ 0
    deltas = jnp.tile(jnp.asarray([0.0, 0.0, -20.0, -20.0]), (2, 2, 3, 1))
    _props, _scores, valid = filter_proposals_single(
        (obj,), (deltas,), (anchors[0],),
        image_hw=(16.0, 16.0), pre_nms_top_n=12, post_nms_top_n=8,
        nms_thresh=0.7, min_size=1e-3,
    )
    assert not bool(np.asarray(valid).any())


def test_rpn_loss_perfect_predictions_low_loss():
    cfg = DetectionConfig(max_gt=2)
    anchors = jnp.asarray(grid_anchors((8, 8), 4, 32.0))
    # gt coincides exactly with the size-32 square anchor shifted to (16,16)
    gt = jnp.asarray([[0.0, 0.0, 32.0, 32.0], [0, 0, 0, 0]])
    gt_valid = jnp.asarray([True, False])
    # objectness: +10 for anchors with IoU>=0.7, -10 otherwise; deltas = exact
    from slowfast_vos_tpu.ops.boxes import box_iou

    iou = box_iou(anchors, gt[:1])
    pos = np.asarray(iou[:, 0] >= 0.7)
    assert pos.any()
    obj_good = jnp.where(jnp.asarray(pos), 10.0, -10.0)
    deltas_good = encode_boxes(jnp.broadcast_to(gt[0], anchors.shape), anchors)
    obj_l, box_l = rpn_loss_single(
        jax.random.PRNGKey(0), obj_good, deltas_good, anchors, gt, gt_valid, cfg
    )
    assert float(obj_l) < 1e-3
    assert float(box_l) < 1e-6
    # bad predictions score much worse
    obj_l2, _ = rpn_loss_single(
        jax.random.PRNGKey(0), -obj_good, deltas_good, anchors, gt, gt_valid, cfg
    )
    assert float(obj_l2) > 1.0


def test_smooth_l1():
    x = jnp.asarray([0.05, 0.5, -2.0])
    out = np.asarray(smooth_l1(x, beta=1.0 / 9.0))
    beta = 1.0 / 9.0
    np.testing.assert_allclose(out[0], 0.5 * 0.05 ** 2 / beta, rtol=1e-5)
    np.testing.assert_allclose(out[1], 0.5 - 0.5 * beta, rtol=1e-5)
    np.testing.assert_allclose(out[2], 2.0 - 0.5 * beta, rtol=1e-5)


def test_postprocess_detections_selects_confident_class():
    cfg = DetectionConfig(detections_per_img=4)
    p = 6
    proposals = jnp.asarray(
        np.array([[10, 10, 50, 50]] * p, np.float32)
        + np.arange(p)[:, None] * np.array([30, 0, 30, 0], np.float32)
    )
    # others are confident BACKGROUND (object score ~5e-5, below 0.05 thresh)
    logits = jnp.tile(jnp.asarray([5.0, -5.0]), (p, 1))
    logits = logits.at[2].set(jnp.asarray([-5.0, 5.0]))  # proposal 2 = object
    reg = jnp.zeros((p, 2, 4))
    boxes, scores, labels, valid = postprocess_detections_single(
        logits, reg, proposals, jnp.ones((p,), bool), (200.0, 300.0), cfg
    )
    assert int(np.asarray(valid).sum()) == 1
    assert int(labels[0]) == 1
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(proposals[2]), atol=1e-4)
    assert float(scores[0]) > 0.99


def test_postprocess_respects_score_threshold():
    cfg = DetectionConfig(detections_per_img=4, box_score_thresh=0.05)
    p = 3
    proposals = jnp.asarray(np.array([[0, 0, 20, 20]] * p, np.float32))
    logits = jnp.zeros((p, 2))  # softmax 0.5 each... above thresh
    reg = jnp.zeros((p, 2, 4))
    _b, _s, _l, valid = postprocess_detections_single(
        logits, reg, proposals, jnp.zeros((p,), bool), (64.0, 64.0), cfg
    )
    # all proposals invalid -> nothing survives
    assert not bool(np.asarray(valid).any())


def test_rpn_loss_compact_equals_full_anchor_formula():
    """The compact-sampled loss must equal the full-anchor mask formulation
    evaluated on the SAME sampled set (reconstructed from the compact
    indices): the gather rewrite changes where the losses are computed, not
    what they are."""
    from slowfast_vos_tpu.models.matching import (
        match_to_gt, sample_balanced_indices, BELOW_LOW,
    )

    cfg = DetectionConfig(max_gt=2)
    rng = np.random.default_rng(11)
    anchors = jnp.asarray(grid_anchors((8, 8), 4, 24.0))
    n = anchors.shape[0]
    gt = jnp.asarray([[2.0, 3.0, 30.0, 28.0], [10.0, 12.0, 26.0, 31.0]])
    gt_valid = jnp.asarray([True, True])
    obj = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    deltas = jnp.asarray(rng.normal(size=(n, 4)) * 0.2, jnp.float32)
    key = jax.random.PRNGKey(5)

    obj_l, box_l = rpn_loss_single(key, obj, deltas, anchors, gt, gt_valid, cfg)

    # reconstruct the sampled set exactly as rpn_loss_single draws it
    from slowfast_vos_tpu.ops.boxes import box_iou, encode_boxes as enc

    iou = box_iou(anchors, gt)
    matches = match_to_gt(
        iou, gt_valid,
        high_threshold=cfg.rpn_fg_iou, low_threshold=cfg.rpn_bg_iou,
        allow_low_quality=True,
    )
    idx, is_pos, valid = sample_balanced_indices(
        key, matches >= 0, matches == BELOW_LOW,
        batch_size=cfg.rpn_batch_size_per_image,
        positive_fraction=cfg.rpn_positive_fraction,
    )
    idx, is_pos, valid = np.asarray(idx), np.asarray(is_pos), np.asarray(valid)
    pos_mask = np.zeros(n, bool)
    pos_mask[idx[valid & is_pos]] = True
    neg_mask = np.zeros(n, bool)
    neg_mask[idx[valid & ~is_pos]] = True
    sampled = pos_mask | neg_mask
    num_sampled = max(sampled.sum(), 1)

    matched_gt = np.asarray(gt)[np.clip(np.asarray(matches), 0, None)]
    reg_t = np.asarray(enc(jnp.asarray(matched_gt), anchors))
    box_full = np.asarray(smooth_l1(deltas - reg_t, beta=1.0 / 9.0)).sum(-1)
    box_ref = box_full[pos_mask].sum() / num_sampled

    o = np.asarray(obj)
    labels = pos_mask.astype(np.float32)
    bce = np.maximum(o, 0) - o * labels + np.log1p(np.exp(-np.abs(o)))
    obj_ref = bce[sampled].sum() / num_sampled

    np.testing.assert_allclose(float(box_l), box_ref, rtol=1e-5)
    np.testing.assert_allclose(float(obj_l), obj_ref, rtol=1e-5)


def test_filter_proposals_batched_matches_per_frame_single():
    """The clip-level `filter_proposals` (batched pre-NMS top-k/decode, bf16
    head outputs) must select bit-identically to mapping
    `filter_proposals_single` over f32 per-frame inputs: bf16 -> f32 casting
    is exact, so ordering, ties, decode, and NMS all coincide. Two FPN levels
    of different sizes exercise the level padding; quantized scores force
    ties."""
    from slowfast_vos_tpu.models.rpn import filter_proposals

    cfg = DetectionConfig(
        rpn_pre_nms_top_n_test=32, rpn_post_nms_top_n_test=16,
        rpn_nms_thresh=0.7, rpn_min_size=1e-3,
    )
    anchors = (
        jnp.asarray(grid_anchors((6, 6), 8, 32.0)),
        jnp.asarray(grid_anchors((3, 3), 16, 64.0)),
    )
    rng = np.random.default_rng(7)
    t = 3
    # bf16-valued, tie-heavy scores (quantized to 0.25 steps)
    obj = tuple(
        jnp.asarray(
            np.round(rng.normal(size=(t, h, w, 3)) * 4) / 4, np.float32
        ).astype(jnp.bfloat16)
        for h, w in ((6, 6), (3, 3))
    )
    dlt = tuple(
        jnp.asarray(rng.normal(size=(t, h, w, 3, 4)) * 0.1, np.float32).astype(
            jnp.bfloat16
        )
        for h, w in ((6, 6), (3, 3))
    )
    image_hw = (48.0, 48.0)

    got_b, got_s, got_v = filter_proposals(
        obj, dlt, anchors, image_hw=image_hw, cfg=cfg, training=False
    )
    for f in range(t):
        wb, ws, wv = filter_proposals_single(
            tuple(o[f].astype(jnp.float32) for o in obj),
            tuple(d[f].astype(jnp.float32) for d in dlt),
            anchors,
            image_hw=image_hw,
            pre_nms_top_n=cfg.rpn_pre_nms_top_n_test,
            post_nms_top_n=cfg.rpn_post_nms_top_n_test,
            nms_thresh=cfg.rpn_nms_thresh,
            min_size=cfg.rpn_min_size,
        )
        np.testing.assert_array_equal(np.asarray(got_v[f]), np.asarray(wv))
        np.testing.assert_array_equal(np.asarray(got_s[f]), np.asarray(ws))
        np.testing.assert_array_equal(np.asarray(got_b[f]), np.asarray(wb))
