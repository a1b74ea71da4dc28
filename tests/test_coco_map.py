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
