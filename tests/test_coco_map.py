"""COCO-protocol mAP tests.

The `test_hand_computed_*` cases are external-oracle fixtures: their expected
values are derived BY HAND from the COCO evaluation definition (101-point
interpolated AP over recall points 0:0.01:1, precision envelope, greedy
score-ordered matching to the highest-IoU free gt, thresholds 0.5:0.05:0.95)
— the protocol implemented by pycocotools, which the reference uses via
`code/maskrcnn/coco_eval.py:19-157`. The derivations are spelled out inline
so the numbers can be re-checked without any library."""
import numpy as np

from slowfast_vos_tpu.eval.coco import coco_map


def det(boxes, scores=None, labels=None, masks=None):
    boxes = np.asarray(boxes, np.float32)
    n = len(boxes)
    d = {
        "boxes": boxes,
        "labels": np.asarray(labels if labels is not None else np.ones(n), np.int32),
        "valid": np.ones(n, bool),
    }
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    if masks is not None:
        d["masks"] = np.asarray(masks, np.float32)
    return d


def test_perfect_predictions_score_one():
    gt = [det([[0, 0, 10, 10], [20, 20, 40, 40]])]
    pred = [det([[0, 0, 10, 10], [20, 20, 40, 40]], scores=[0.9, 0.8])]
    out = coco_map(pred, gt)
    assert np.isclose(out["mAP"], 1.0)
    assert np.isclose(out["AP50"], 1.0)


def test_miss_halves_ap():
    gt = [det([[0, 0, 10, 10], [20, 20, 40, 40]])]
    pred = [det([[0, 0, 10, 10]], scores=[0.9])]  # one gt missed
    out = coco_map(pred, gt)
    # recall caps at 0.5 with perfect precision -> 101-pt AP ~ 0.5
    assert 0.45 < out["AP50"] < 0.55


def test_false_positive_lowers_precision():
    gt = [det([[0, 0, 10, 10]])]
    pred = [det([[100, 100, 110, 110], [0, 0, 10, 10]], scores=[0.95, 0.9])]
    out = coco_map(pred, gt)
    assert out["AP50"] < 1.0
    assert out["AP50"] > 0.4  # the true detection still recovers recall


def test_localization_quality_affects_high_iou_thresholds():
    gt = [det([[0, 0, 100, 100]])]
    pred = [det([[0, 0, 90, 100]], scores=[0.9])]  # IoU 0.9
    out = coco_map(pred, gt)
    assert np.isclose(out["AP50"], 1.0)
    assert out["mAP"] < 1.0  # fails at IoU thresholds > 0.9


def test_segm_kind():
    m = np.zeros((1, 50, 50)); m[0, :25] = 1
    gt = [det([[0, 0, 50, 25]], masks=m)]
    pred = [det([[0, 0, 50, 25]], scores=[0.9], masks=m)]
    out = coco_map(pred, gt, kind="segm")
    assert np.isclose(out["mAP"], 1.0)


def test_hand_computed_bbox_map():
    """Two images, one class, four detections; every AP value derived by hand.

    Img1 gt: A=[0,0,10,10], B=[20,20,30,30].
    Img2 gt: C=[0,0,20,20].
    Detections (global score order):
      P1=[0,0,10,10]  s=0.9  IoU(A)=1.0
      P2=[20,24,30,30] s=0.8 IoU(B)=0.6   (inter 10x6=60, union 100+60-60)
      P3=[0,0,20,20]  s=0.7  IoU(C)=1.0
      P4=[50,50,60,60] s=0.6  IoU=0 with everything (pure FP)

    Thresholds 0.50/0.55/0.60 (P2 is a TP, 0.6 >= t):
      TP,TP,TP,FP -> precision envelope 1.0 up to recall 1.0 -> AP = 1.
    Thresholds 0.65..0.95 (7 of them; P2 becomes a FP):
      order TP,FP,TP,FP -> recall [1/3,1/3,2/3,2/3],
      precision [1,1/2,2/3,1/2], envelope [1,2/3,2/3,1/2].
      101 recall points: 0.00-0.33 (34 pts) -> 1.0; 0.34-0.66 (33 pts) ->
      2/3; 0.67-1.00 (34 pts) -> 0 (recall never reaches them).
      AP = (34*1 + 33*2/3) / 101 = 56/101.
    mAP = (3*1 + 7*56/101) / 10.
    """
    gt = [
        det([[0, 0, 10, 10], [20, 20, 30, 30]]),
        det([[0, 0, 20, 20]]),
    ]
    pred = [
        det([[0, 0, 10, 10], [20, 24, 30, 30]], scores=[0.9, 0.8]),
        det([[0, 0, 20, 20], [50, 50, 60, 60]], scores=[0.7, 0.6]),
    ]
    out = coco_map(pred, gt)
    assert np.isclose(out["AP50"], 1.0)
    expected_map = (3 * 1.0 + 7 * (56 / 101)) / 10
    assert np.isclose(out["mAP"], expected_map), (out["mAP"], expected_map)


def test_hand_computed_segm_map():
    """Mask analogue: pred mask covers 60% of a 10x10 gt mask (IoU 0.6 exactly
    at every threshold), second gt matched perfectly.

    Class AP per threshold:
      t <= 0.60: both TPs -> AP 1.0 (3 thresholds). The exact-integer mask
      IoU of 0.6 at the nominal-0.6 threshold is the pycocotools-grid
      regression: linspace's 0.5999999999999999778 keeps it a TP (an
      arange-based grid would silently flip it to a FP).
      t >= 0.65: score order is FP (s=.9, the IoU-0.6 mask) then TP (s=.8):
      recall [0,1/2], precision [0,1/2], envelope [1/2,1/2]; recall points
      0.00-0.50 (51 pts) -> 1/2, rest 0. AP = 51*(1/2)/101.
    mAP = (3*1 + 7*51*(1/2)/101) / 10.
    """
    g1 = np.zeros((1, 40, 40)); g1[0, 0:10, 0:10] = 1
    g2 = np.zeros((1, 40, 40)); g2[0, 20:30, 20:30] = 1
    p1 = np.zeros((1, 40, 40)); p1[0, 0:10, 0:6] = 1   # inter 60, union 100
    p2 = g2.copy()
    gt = [det([[0, 0, 10, 10]], masks=g1), det([[20, 20, 30, 30]], masks=g2)]
    pred = [
        det([[0, 0, 10, 6]], scores=[0.9], masks=p1),
        det([[20, 20, 30, 30]], scores=[0.8], masks=p2),
    ]
    out = coco_map(pred, gt, kind="segm")
    expected_map = (3 * 1.0 + 7 * (51 * 0.5 / 101)) / 10
    assert np.isclose(out["mAP"], expected_map), (out["mAP"], expected_map)


def test_hand_computed_multiclass_mean():
    """Class 2 has one gt and zero predictions -> AP 0 at every threshold;
    class 1 is perfect -> AP 1. mAP is the unweighted class mean 0.5.
    A class absent from the gt contributes nothing (nan-excluded)."""
    gt = [det([[0, 0, 10, 10], [20, 20, 30, 30]], labels=[1, 2])]
    pred = [det([[0, 0, 10, 10]], scores=[0.9], labels=[1])]
    out = coco_map(pred, gt, classes=[1, 2, 3])
    assert np.isclose(out["per_class"][1], 1.0)
    assert np.isclose(out["per_class"][2], 0.0)
    assert np.isnan(out["per_class"][3])
    assert np.isclose(out["mAP"], 0.5)


def test_greedy_matching_prefers_highest_iou_free_gt():
    """pycocotools rule: a detection takes the FREE gt with max IoU >= t, in
    score order. P_hi overlaps both gts but most tightly G2; P_lo then only has
    G1 left. Both must match at t=0.5."""
    gt = [det([[0, 0, 10, 10], [0, 4, 10, 14]])]
    pred = [det([[0, 4, 10, 14], [0, 0, 10, 10]], scores=[0.9, 0.8])]
    out = coco_map(pred, gt)
    assert np.isclose(out["AP50"], 1.0)
