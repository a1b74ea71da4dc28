import numpy as np
import jax.numpy as jnp

from slowfast_vos_tpu.ops import (
    box_iou,
    clip_boxes,
    encode_boxes,
    decode_boxes,
    nms_mask,
    batched_nms_mask,
)


def ref_iou(b1, b2):
    n, m = len(b1), len(b2)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            xa = max(b1[i, 0], b2[j, 0]); ya = max(b1[i, 1], b2[j, 1])
            xb = min(b1[i, 2], b2[j, 2]); yb = min(b1[i, 3], b2[j, 3])
            inter = max(0.0, xb - xa) * max(0.0, yb - ya)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            u = a1 + a2 - inter
            out[i, j] = inter / u if u > 0 else 0.0
    return out


def ref_nms(boxes, scores, thresh):
    """Sequential greedy NMS, the classic O(N^2) reference."""
    order = np.argsort(-scores, kind="stable")
    iou = ref_iou(boxes, boxes)
    suppressed = np.zeros(len(boxes), bool)
    keep = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if not keep[j] and iou[i, j] > thresh:
                suppressed[j] = True
    return keep


def rand_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_iou_matches_reference():
    rng = np.random.default_rng(0)
    b1, b2 = rand_boxes(rng, 17), rand_boxes(rng, 9)
    np.testing.assert_allclose(np.asarray(box_iou(b1, b2)), ref_iou(b1, b2), atol=1e-5)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    anchors = rand_boxes(rng, 31)
    gt = rand_boxes(rng, 31)
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = encode_boxes(gt, anchors, w)
        back = decode_boxes(deltas, anchors, w)
        np.testing.assert_allclose(np.asarray(back), gt, atol=5e-3)


def test_clip_boxes():
    b = jnp.array([[-5.0, -5.0, 50.0, 200.0]])
    out = np.asarray(clip_boxes(b, (100, 40)))
    np.testing.assert_allclose(out, [[0, 0, 40, 100]])


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(2)
    for algorithm in ("blocked", "fixpoint"):
        for n in [5, 37, 150]:
            boxes = rand_boxes(rng, n, size=60.0)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            keep, _ = nms_mask(
                jnp.asarray(boxes), jnp.asarray(scores),
                iou_threshold=0.5, block_size=32, algorithm=algorithm,
            )
            ref = ref_nms(boxes, scores, 0.5)
            np.testing.assert_array_equal(np.asarray(keep), ref, err_msg=algorithm)


def test_nms_fixpoint_suppression_chain():
    # chain: 0 suppresses 1, 1 suppresses 2, 0 does not overlap 2 ->
    # greedy keeps {0, 2}; a naive one-shot suppression would drop 2.
    boxes = np.array(
        [[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], np.float32
    )  # IoU(0,1)=IoU(1,2)=0.43, IoU(0,2)=0.11
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    for algorithm in ("blocked", "fixpoint"):
        keep, _ = nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores),
            iou_threshold=0.3, block_size=32, algorithm=algorithm,
        )
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True], err_msg=algorithm)


def test_nms_respects_valid_mask():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    valid = np.array([False, True])
    keep, _ = nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    assert not bool(keep[0]) and bool(keep[1])


def test_batched_nms_keeps_cross_category_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    keep, _ = batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs))
    assert bool(keep[0]) and bool(keep[1])
    keep_same, _ = batched_nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(2, jnp.int32)
    )
    assert bool(keep_same[0]) and not bool(keep_same[1])
