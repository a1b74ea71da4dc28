"""Differential oracle: our DavisScorer vs the reference's vendored official
scorer (`/root/reference/code/davis2017_evaluation/`), imported READ-ONLY.

The J&F scorer is the instrument every accept-gate depends on; this suite
removes its self-certification by running both scorers over seeded random
multi-object 2016- and 2017-layout trees (void pixels, empty gt frames,
empty result frames, more proposals than objects) and asserting the full
J/F statistics agree to 1e-12.

The reference package is pure numpy/cv2/scipy except one function-local
`skimage.morphology.disk` import (`davis2017/metrics.py:84`), shimmed here
with our own cv2-equivalent kernel (`eval/metrics.py:disk_kernel` — verified
equal to skimage's definition x^2+y^2 <= r^2).
"""
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from slowfast_vos_tpu.data.davis import save_palette_mask
from slowfast_vos_tpu.eval.metrics import disk_kernel
from slowfast_vos_tpu.eval.scorer import DavisScorer

REFERENCE_CODE = "/root/reference/code"


@pytest.fixture(scope="module")
def reference_evaluation():
    """Import the vendored scorer read-only, with a skimage shim."""
    if not os.path.isdir(os.path.join(REFERENCE_CODE, "davis2017_evaluation")):
        pytest.skip("reference tree not present")
    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        morphology = types.ModuleType("skimage.morphology")
        morphology.disk = lambda radius: disk_kernel(radius)
        skimage.morphology = morphology
        sys.modules["skimage"] = skimage
        sys.modules["skimage.morphology"] = morphology
    sys.path.insert(0, REFERENCE_CODE)
    try:
        from davis2017_evaluation.davis2017.evaluation import DAVISEvaluation
    finally:
        sys.path.remove(REFERENCE_CODE)
    return DAVISEvaluation


# -- synthetic DAVIS trees ----------------------------------------------------

H, W = 60, 80


def _blob(rng, h=H, w=W, p=0.5):
    """Random connected-ish blob mask (thresholded smoothed noise)."""
    if rng.random() > p:
        return np.zeros((h, w), bool)
    cy, cx = rng.integers(5, h - 5), rng.integers(5, w - 5)
    ry, rx = rng.integers(4, 18), rng.integers(4, 22)
    y, x = np.ogrid[:h, :w]
    return ((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2 <= 1.0


def _write_imageset_2016(root, seqs, frames_per_seq):
    d = os.path.join(root, "ImageSets", "480p")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "val.txt"), "w") as f:
        for seq in seqs:
            for i in range(frames_per_seq):
                f.write(
                    f"/JPEGImages/480p/{seq}/{i:05d}.jpg "
                    f"/Annotations/480p/{seq}/{i:05d}.png\n"
                )


def _write_imageset_2017(root, seqs):
    d = os.path.join(root, "ImageSets", "2017")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "val.txt"), "w") as f:
        for seq in seqs:
            f.write(seq + "\n")


def _write_frames(root, seq, gt_id_masks):
    """gt_id_masks: [T,H,W] uint8 object-id (or 0/255 binary for 2016)."""
    img_dir = os.path.join(root, "JPEGImages", "480p", seq)
    ann_dir = os.path.join(root, "Annotations", "480p", seq)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    for i, m in enumerate(gt_id_masks):
        Image.new("RGB", (W, H)).save(os.path.join(img_dir, f"{i:05d}.jpg"))
        save_palette_mask(m, os.path.join(ann_dir, f"{i:05d}.png"))


def _build_2016_tree(root, seed, t=9, seqs=("alpha", "beta")):
    rng = np.random.default_rng(seed)
    _write_imageset_2016(root, seqs, t)
    for seq in seqs:
        gt = np.stack([_blob(rng, p=0.85) for _ in range(t)])  # some empty frames
        _write_frames(root, seq, gt.astype(np.uint8) * 255)


def _write_results_2016(res_root, seed, t=9, seqs=("alpha", "beta")):
    rng = np.random.default_rng(seed + 1)
    for seq in seqs:
        d = os.path.join(res_root, seq)
        os.makedirs(d, exist_ok=True)
        for i in range(t):
            m = _blob(rng, p=0.8)
            Image.fromarray(m.astype(np.uint8) * 255).save(
                os.path.join(d, f"{i:05d}.png")
            )


def _build_2017_tree(root, seed, t=9, seqs=("gamma", "delta"), n_obj=3):
    rng = np.random.default_rng(seed)
    _write_imageset_2017(root, seqs)
    for seq in seqs:
        frames = []
        for i in range(t):
            m = np.zeros((H, W), np.uint8)
            for o in range(1, n_obj + 1):
                # every object present in frame 0 (the protocol derives the
                # object count from frame 0, davis.py:101), may vanish later
                b = _blob(rng, p=1.0 if i == 0 else 0.7)
                m[b & (m == 0)] = o
            void = _blob(rng, p=0.5)
            m[void & (m == 0)] = 255  # void label ON TOP of background only
            frames.append(m)
        _write_frames(root, seq, np.stack(frames))


def _write_results_2017(res_root, seed, t=9, seqs=("gamma", "delta"), n_prop=5):
    rng = np.random.default_rng(seed + 1)
    for seq in seqs:
        d = os.path.join(res_root, seq)
        os.makedirs(d, exist_ok=True)
        for i in range(t):
            m = np.zeros((H, W), np.uint8)
            if i != 2:  # frame 2: empty result frame
                for p in range(1, n_prop + 1):
                    # proposal ids present in at least one frame define the
                    # proposal count (results.py:31); more proposals than
                    # gt objects exercises the Hungarian rectangular case
                    b = _blob(rng, p=0.75)
                    m[b & (m == 0)] = p
            save_palette_mask(m, os.path.join(d, f"{i:05d}.png"))


# -- comparison ---------------------------------------------------------------

def _assert_metrics_equal(ours: dict, ref: dict):
    for metric in ("J", "F"):
        for stat in ("M", "R", "D"):
            np.testing.assert_allclose(
                np.asarray(ours[metric][stat], float),
                np.asarray(ref[metric][stat], float),
                rtol=0,
                atol=1e-12,
                err_msg=f"{metric}/{stat}",
            )
        assert set(ours[metric]["M_per_object"]) == set(ref[metric]["M_per_object"])
        for k in ref[metric]["M_per_object"]:
            np.testing.assert_allclose(
                ours[metric]["M_per_object"][k],
                ref[metric]["M_per_object"][k],
                rtol=0,
                atol=1e-12,
                err_msg=f"{metric}/M_per_object/{k}",
            )


@pytest.mark.parametrize("task", ["unsupervised", "semi-supervised"])
@pytest.mark.parametrize("seed", [0, 7])
def test_2016_layout_matches_reference(tmp_path, reference_evaluation, task, seed):
    root, res = str(tmp_path / "DAVIS"), str(tmp_path / "res")
    _build_2016_tree(root, seed)
    _write_results_2016(res, seed)
    ours = DavisScorer(root, task=task, gt_set="val", year="2016").evaluate(res)
    ref = reference_evaluation(root, task, "val", year="2016").evaluate(res)
    _assert_metrics_equal(ours, ref)


@pytest.mark.parametrize("task", ["unsupervised", "semi-supervised"])
@pytest.mark.parametrize("seed", [0, 11])
def test_2017_layout_matches_reference(tmp_path, reference_evaluation, task, seed):
    root, res = str(tmp_path / "DAVIS"), str(tmp_path / "res")
    _build_2017_tree(root, seed)
    # semi-supervised forbids more result ids than gt objects
    # (`evaluation.py:32-34` sys.exits); 2 < 3 exercises the zero-pad path
    _write_results_2017(res, seed, n_prop=5 if task == "unsupervised" else 2)
    ours = DavisScorer(root, task=task, gt_set="val", year="2017").evaluate(res)
    ref = reference_evaluation(root, task, "val", year="2017").evaluate(res)
    _assert_metrics_equal(ours, ref)


def test_gt_as_prediction_perfect_score(tmp_path, reference_evaluation):
    """Both scorers must give J=F=1 when the gt is fed back as the result."""
    root = str(tmp_path / "DAVIS")
    _build_2017_tree(root, 3, seqs=("eps",))
    res = str(tmp_path / "res")
    d = os.path.join(res, "eps")
    os.makedirs(d)
    for i in range(9):
        raw = np.array(
            Image.open(os.path.join(root, "Annotations", "480p", "eps", f"{i:05d}.png"))
        )
        save_palette_mask(np.where(raw == 255, 0, raw), os.path.join(d, f"{i:05d}.png"))
    ours = DavisScorer(root, task="unsupervised", gt_set="val", year="2017").evaluate(res)
    ref = reference_evaluation(root, "unsupervised", "val", year="2017").evaluate(res)
    _assert_metrics_equal(ours, ref)
    assert np.allclose(ours["J"]["M"], 1.0) and np.allclose(ours["F"]["M"], 1.0)
