"""DAVIS evaluation protocol: gt loading, results loading, J&F scoring.

Fresh implementation of the vendored official scorer the reference ships
(`code/davis2017_evaluation/davis2017/{davis,results,evaluation}.py`):

* gt masks read from `Annotations/<res>/<seq>/*.png`; 2017 palette ids are
  separate objects with id 255 = void; 2016 masks are binary (0/255);
* result masks read from `<res_path>/<seq>/<frame_id>.png`, `/255` for
  2016-style binary masks, split per object id otherwise;
* `semi-supervised` task: first and last frames are excluded from scoring;
* `unsupervised` task: up to 20 proposals, Hungarian-matched to gt objects by
  mean (J+F)/2 via `scipy.optimize.linear_sum_assignment`;
* per-object statistics are (mean, recall, decay) from `eval/metrics.py`.

The on-disk PNG contract is identical to the reference's, so masks produced
by either framework score interchangeably.
"""
from __future__ import annotations

import os
from glob import glob

import numpy as np
from PIL import Image
from scipy.optimize import linear_sum_assignment

from slowfast_vos_tpu.eval.metrics import (
    boundary_f_from_precomputed,
    boundary_f_measure,
    boundary_precompute,
    db_statistics,
    jaccard,
    jaccard_all_pairs,
)


class DavisScorer:
    def __init__(
        self,
        davis_root: str,
        task: str = "unsupervised",
        gt_set: str = "val",
        sequences="all",
        year: str = "2016",
        resolution: str = "480p",
    ):
        assert task in ("unsupervised", "semi-supervised")
        self.task = task
        self.year = year
        self.root = davis_root
        self.mask_path = os.path.join(davis_root, "Annotations", resolution)
        imagesets = os.path.join(
            davis_root, "ImageSets", year if year == "2017" else resolution
        )
        if sequences == "all":
            with open(os.path.join(imagesets, f"{gt_set}.txt")) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
            if year == "2017":
                self.sequences = lines
            else:
                self.sequences = sorted({ln.split()[0].split("/")[-2] for ln in lines})
        else:
            self.sequences = sequences if isinstance(sequences, list) else [sequences]

    # -- gt / results loading -------------------------------------------------

    def _gt_masks(self, seq: str):
        """Returns (gt [O,T,H,W] bool, void [T,H,W] bool | None, frame_ids)."""
        paths = sorted(glob(os.path.join(self.mask_path, seq, "*.png")))
        frame_ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        raw = np.stack([np.array(Image.open(p)) for p in paths])
        if self.year == "2016":
            if raw.max() == 255:
                raw = raw // 255
            gt = (raw > 0)[None]  # single object
            void = None
        else:
            void = raw == 255
            raw = np.where(void, 0, raw)
            # Protocol quirk kept: the object count comes from FRAME 0 only
            # (`davis.py:101` `num_objects = int(np.max(masks[0, ...]))`);
            # every DAVIS object is annotated in frame 0, and matching the
            # reference keeps the two scorers numerically interchangeable.
            num_objects = int(raw[0].max())
            ids = np.arange(1, num_objects + 1)
            gt = raw[None] == ids[:, None, None, None]
        return gt, void, frame_ids

    def _result_masks(self, res_path: str, seq: str, frame_ids, max_objects: int):
        first = np.array(Image.open(os.path.join(res_path, seq, f"{frame_ids[0]}.png")))
        # uint8 end to end: the [P, T, H, W] broadcast compare below was 47%
        # of scorer wall time when `masks` defaulted to float64 (8x the
        # bytes); id values are <= 255 so the integer compare is exact.
        masks = np.zeros((len(frame_ids), *first.shape[:2]), np.uint8)
        for i, fid in enumerate(frame_ids):
            masks[i] = np.array(Image.open(os.path.join(res_path, seq, f"{fid}.png")))
        if self.year == "2016" and masks.max() == 255:
            masks //= 255
        num_objects = 1 if self.year == "2016" else int(masks.max())
        ids = np.arange(1, max(num_objects, 1) + 1, dtype=np.uint8)
        return masks[None] == ids[:, None, None, None]

    # -- scoring --------------------------------------------------------------

    @staticmethod
    def _score_semisupervised(gt, res, void):
        n_obj = gt.shape[0]
        if res.shape[0] < n_obj:
            res = np.concatenate(
                [res, np.zeros((n_obj - res.shape[0], *res.shape[1:]), bool)]
            )
        j = np.stack([jaccard(gt[o], res[o], void) for o in range(n_obj)])
        f = np.stack([boundary_f_measure(gt[o], res[o], void) for o in range(n_obj)])
        return j, f

    @staticmethod
    def _score_unsupervised(gt, res, void, max_n_proposals=20):
        n_obj, n_prop = gt.shape[0], res.shape[0]
        assert n_prop <= max_n_proposals, "too many proposals"
        if n_prop < n_obj:
            res = np.concatenate(
                [res, np.zeros((n_obj - n_prop, *res.shape[1:]), bool)]
            )
            n_prop = n_obj
        t = gt.shape[1]
        f = np.zeros((n_prop, n_obj, t))
        # The official per-pair loop recomputes boundaries/dilations and
        # full-frame boolean reductions for all O x P pairs
        # (`davis2017/evaluation.py:46-66`). Here J for ALL pairs comes from
        # one per-frame bincount of the joint id raster (the decompositions
        # are disjoint — `jaccard_all_pairs`), and F's pair-independent
        # boundary+dilation work is hoisted once per unique mask with the
        # per-pair overlap counts on bit-packed bytes + popcounts. Integer
        # counts — and therefore scores — are identical to the per-pair
        # formulation (oracle-tested to 1e-12 vs the vendored scorer).
        j = jaccard_all_pairs(gt, res, void)
        gt_pre = [boundary_precompute(gt[o], void) for o in range(n_obj)]
        res_pre = [boundary_precompute(res[p], void) for p in range(n_prop)]
        for o in range(n_obj):
            for p in range(n_prop):
                f[p, o] = boundary_f_from_precomputed(gt_pre[o], res_pre[p])
        combined = (j.mean(axis=2) + f.mean(axis=2)) / 2
        row, col = linear_sum_assignment(-combined)
        return j[row, col], f[row, col]

    def evaluate(self, res_path: str) -> dict:
        """Score a results directory. Returns the same nested structure as the
        reference scorer: {'J': {M, R, D, M_per_object}, 'F': {...}}."""
        out = {
            "J": {"M": [], "R": [], "D": [], "M_per_object": {}},
            "F": {"M": [], "R": [], "D": [], "M_per_object": {}},
        }
        for seq in self.sequences:
            gt, void, frame_ids = self._gt_masks(seq)
            if self.task == "semi-supervised":
                gt = gt[:, 1:-1]
                void = None if void is None else void[1:-1]
                frame_ids = frame_ids[1:-1]
            res = self._result_masks(res_path, seq, frame_ids, gt.shape[0])
            if self.task == "unsupervised":
                j, f = self._score_unsupervised(gt, res, void)
            else:
                # Protocol quirk kept: the reference scores semi-supervised
                # WITHOUT void exclusion (`evaluation.py:97` passes None even
                # when void masks exist) — matched for interchangeability.
                j, f = self._score_semisupervised(gt, res, None)
            for o in range(gt.shape[0]):
                name = f"{seq}_{o + 1}"
                jm, jr, jd = db_statistics(j[o])
                fm, fr, fd = db_statistics(f[o])
                out["J"]["M"].append(jm)
                out["J"]["R"].append(jr)
                out["J"]["D"].append(jd)
                out["J"]["M_per_object"][name] = jm
                out["F"]["M"].append(fm)
                out["F"]["R"].append(fr)
                out["F"]["D"].append(fd)
                out["F"]["M_per_object"][name] = fm
        return out


def summarize(metrics: dict):
    """Global summary row: (J&F-Mean, J-Mean, J-Recall, J-Decay, F-Mean,
    F-Recall, F-Decay), matching the reference's pandas table columns."""
    j, f = metrics["J"], metrics["F"]
    jf = (np.mean(j["M"]) + np.mean(f["M"])) / 2
    return {
        "J&F-Mean": float(jf),
        "J-Mean": float(np.mean(j["M"])),
        "J-Recall": float(np.mean(j["R"])),
        "J-Decay": float(np.mean(j["D"])),
        "F-Mean": float(np.mean(f["M"])),
        "F-Recall": float(np.mean(f["R"])),
        "F-Decay": float(np.mean(f["D"])),
    }
