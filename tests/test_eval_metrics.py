"""Scorer tests, modeled on the reference's own test strategy
(code/davis2017_evaluation/pytest/test_evaluation.py): synthetic fixtures where
ground truth fed back as prediction must score exactly J=F=1, an analytic void
test, plus Hungarian-assignment and end-to-end glue checks."""
import os

import numpy as np
import pytest
from PIL import Image

from slowfast_vos_tpu.data.davis import save_palette_mask
from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.eval.metrics import (
    boundary_f_measure,
    db_statistics,
    disk_kernel,
    jaccard,
    seg_to_boundary,
)
from slowfast_vos_tpu.eval.scorer import DavisScorer, summarize


def box_mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def test_jaccard_analytic():
    a = box_mask(20, 20, 0, 10, 0, 10)
    b = box_mask(20, 20, 0, 10, 5, 15)
    assert np.isclose(jaccard(a, b), 50 / 150)
    assert jaccard(a, a) == 1.0
    assert jaccard(np.zeros((5, 5)), np.zeros((5, 5))) == 1.0  # empty-union rule
    assert jaccard(a, np.zeros_like(a)) == 0.0


def test_jaccard_void_exclusion():
    # void region covers exactly the disagreement -> perfect score
    a = box_mask(20, 20, 0, 10, 0, 10)
    b = box_mask(20, 20, 0, 10, 0, 12)
    void = box_mask(20, 20, 0, 20, 10, 12)
    assert jaccard(a, b) < 1.0
    assert jaccard(a, b, void) == 1.0


def test_boundary_identity_and_shift():
    a = box_mask(64, 64, 16, 48, 16, 48)
    assert boundary_f_measure(a, a) == 1.0
    shifted = box_mask(64, 64, 17, 49, 16, 48)  # 1px shift within tolerance disk
    assert boundary_f_measure(a, shifted) == 1.0
    far = box_mask(64, 64, 40, 60, 40, 60)
    assert boundary_f_measure(a, far) < 0.5
    assert boundary_f_measure(np.zeros((32, 32)), np.zeros((32, 32))) == 1.0
    assert boundary_f_measure(a, np.zeros_like(a)) == 0.0


def test_seg_to_boundary_is_thin():
    a = box_mask(32, 32, 8, 24, 8, 24)
    b = seg_to_boundary(a)
    # 16x16 square: boundary is the 1-px inner ring offset toward origin
    assert b.sum() <= 4 * 16
    assert b[7:24, 7:24].any()
    assert not b[12, 12]  # interior clear


def test_disk_kernel_matches_skimage_semantics():
    k = disk_kernel(2)
    expected = np.array(
        [
            [0, 0, 1, 0, 0],
            [0, 1, 1, 1, 0],
            [1, 1, 1, 1, 1],
            [0, 1, 1, 1, 0],
            [0, 0, 1, 0, 0],
        ],
        np.uint8,
    )
    np.testing.assert_array_equal(k, expected)


def test_db_statistics():
    v = np.array([1.0, 0.8, 0.6, 0.4])
    m, r, d = db_statistics(v)
    assert np.isclose(m, 0.7)
    assert np.isclose(r, 0.75)
    assert d > 0  # decaying sequence has positive decay


@pytest.fixture(scope="module")
def davis16(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("d16"))
    make_synthetic_davis(
        root, num_sequences=2, frames=6, hw=(48, 80), num_objects=1, year="2016", subset="val"
    )
    return root


def test_gt_as_prediction_scores_one(davis16):
    """The reference's `test_unsupervised_flip_gt` analogue: feeding ground
    truth back as the prediction must score exactly J=F=1."""
    scorer = DavisScorer(davis16, task="unsupervised", gt_set="val", year="2016")
    res_root = os.path.join(davis16, "fake_results")
    for seq in scorer.sequences:
        gt, _, frame_ids = scorer._gt_masks(seq)
        os.makedirs(os.path.join(res_root, seq), exist_ok=True)
        for i, fid in enumerate(frame_ids):
            Image.fromarray((gt[0, i] * 255).astype(np.uint8)).save(
                os.path.join(res_root, seq, f"{fid}.png")
            )
    metrics = scorer.evaluate(res_root)
    s = summarize(metrics)
    assert np.isclose(s["J&F-Mean"], 1.0)
    assert np.isclose(s["J-Mean"], 1.0) and np.isclose(s["F-Mean"], 1.0)


def test_semisupervised_excludes_first_last(davis16):
    """Corrupt ONLY first+last frames: semi-supervised score stays perfect."""
    scorer = DavisScorer(
        davis16, task="semi-supervised", gt_set="val", sequences=[DavisScorer(davis16, gt_set="val", year="2016").sequences[0]], year="2016"
    )
    seq = scorer.sequences[0]
    res_root = os.path.join(davis16, "fake_results_semi")
    gt, _, frame_ids = scorer._gt_masks(seq)
    os.makedirs(os.path.join(res_root, seq), exist_ok=True)
    for i, fid in enumerate(frame_ids):
        mask = gt[0, i].copy()
        if i in (0, len(frame_ids) - 1):
            mask = ~mask  # corrupt excluded frames
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(res_root, seq, f"{fid}.png")
        )
    metrics = scorer.evaluate(res_root)
    assert np.isclose(summarize(metrics)["J&F-Mean"], 1.0)


def test_unsupervised_hungarian_2017(tmp_path):
    """Two objects, predictions with permuted ids -> Hungarian recovers the
    matching and scores 1."""
    root = str(tmp_path / "d17")
    make_synthetic_davis(root, num_sequences=1, frames=5, hw=(48, 80), num_objects=2, year="2017", subset="val")
    scorer = DavisScorer(root, task="unsupervised", gt_set="val", year="2017")
    seq = scorer.sequences[0]
    gt, _, frame_ids = scorer._gt_masks(seq)
    res_root = str(tmp_path / "res")
    os.makedirs(os.path.join(res_root, seq), exist_ok=True)
    for i, fid in enumerate(frame_ids):
        canvas = np.zeros(gt.shape[2:], np.uint8)
        canvas[gt[1, i]] = 1  # permuted ids: object 2 -> id 1
        canvas[gt[0, i]] = 2
        save_palette_mask(canvas, os.path.join(res_root, seq, f"{fid}.png"))
    metrics = scorer.evaluate(res_root)
    assert np.isclose(summarize(metrics)["J&F-Mean"], 1.0)


def test_extract_masks_2017_layout_scoreable(tmp_path):
    """Year-2017 extraction must write id-valued palette masks the 2017
    scorer can read (a 255-valued binary PNG would read as 255 proposals
    there); gt-as-prediction through the FULL extract->score round trip."""
    import os

    from PIL import Image

    from slowfast_vos_tpu.data.davis import save_palette_mask
    from slowfast_vos_tpu.eval.scorer import DavisScorer

    root = str(tmp_path / "davis")
    res = str(tmp_path / "results")
    rng = np.random.default_rng(5)
    seq = "synthseq"
    os.makedirs(f"{root}/Annotations/480p/{seq}")
    os.makedirs(f"{root}/ImageSets/2017")
    os.makedirs(f"{res}/{seq}")
    for f in range(4):
        m = np.zeros((40, 64), np.uint8)
        y, x = rng.integers(5, 20, 2)
        m[y : y + 15, x : x + 30] = 1
        save_palette_mask(m, f"{root}/Annotations/480p/{seq}/{f:05d}.png")
        # what extract_masks writes for 2017: union as palette id 1
        save_palette_mask((m > 0).astype(np.uint8), f"{res}/{seq}/{f:05d}.png")
    with open(f"{root}/ImageSets/2017/val.txt", "w") as fh:
        fh.write(seq + "\n")

    scorer = DavisScorer(root, task="unsupervised", gt_set="val", year="2017")
    out = scorer.evaluate(res)
    # gt fed back as prediction must score J == 1 exactly
    assert abs(float(np.mean(out["J"]["M"])) - 1.0) < 1e-9, out["J"]
