#!/usr/bin/env python
"""DAVIS J&F scorer throughput benchmark (host CPU, no TPU needed).

The reference's own benchmark records ~1123 s local / ~1919 s CodaLab for
unsupervised J&F scoring with 20 proposals over the DAVIS-2016 val set
(20 sequences, ~69 frames/seq, 480x854) —
`code/davis2017_evaluation/pytest/test_evaluation.py:146-149` (SURVEY.md §6).

This script rebuilds that workload synthetically at full scale (2017 layout
so result PNGs can encode 20 proposal ids; gt defaults to 1 object/sequence
to match the published 20-pairs-per-sequence shape), times OUR vectorized
scorer (`eval/scorer.py`), and optionally times the vendored reference
scorer on a subset of the same tree for a same-host ratio (the published
number is from different hardware; the same-host ratio is the honest one).

Run:  python scripts/bench_scorer.py [--seqs 20 --frames 69 --reference-seqs 2]
Prints one JSON line per measurement.
"""
import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_WALL_S = 1123.0  # local timing in the reference's benchmark comment
REFERENCE_CODE = "/root/reference/code"


def _paint_ellipse(m, oid, rng, h, w):
    """Paint a random ellipse with id `oid` into free (==0) pixels of `m`,
    touching only its bounding box (val-scale frames make full-frame ogrid
    painting the dominant cost otherwise)."""
    cy, cx = int(rng.integers(30, h - 30)), int(rng.integers(30, w - 30))
    ry, rx = int(rng.integers(12, 60)), int(rng.integers(12, 80))
    y0, y1 = max(cy - ry, 0), min(cy + ry + 1, h)
    x0, x1 = max(cx - rx, 0), min(cx + rx + 1, w)
    y, x = np.ogrid[y0:y1, x0:x1]
    e = ((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2 <= 1.0
    sub = m[y0:y1, x0:x1]
    sub[e & (sub == 0)] = oid


def build_tree(root, res, seqs, frames, hw, objects, proposals, seed=63):
    from slowfast_vos_tpu.data.davis import save_palette_mask

    h, w = hw
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    names = [f"seq{k:02d}" for k in range(seqs)]
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    from PIL import Image

    blank = Image.new("RGB", (w, h))
    for seq in names:
        ann = os.path.join(root, "Annotations", "480p", seq)
        img = os.path.join(root, "JPEGImages", "480p", seq)
        rd = os.path.join(res, seq)
        for d in (ann, img, rd):
            os.makedirs(d, exist_ok=True)
        for i in range(frames):
            gt = np.zeros((h, w), np.uint8)
            for o in range(1, objects + 1):
                _paint_ellipse(gt, o, rng, h, w)  # every object in every frame
            save_palette_mask(gt, os.path.join(ann, f"{i:05d}.png"))
            blank.save(os.path.join(img, f"{i:05d}.jpg"))
            pm = np.zeros((h, w), np.uint8)
            for p in range(1, proposals + 1):
                _paint_ellipse(pm, p, rng, h, w)
            save_palette_mask(pm, os.path.join(rd, f"{i:05d}.png"))
    return names


def time_reference(root, res, n_seqs, names):
    """Vendored reference scorer (read-only import + skimage shim) on the
    first n_seqs sequences."""
    import types

    from slowfast_vos_tpu.eval.metrics import disk_kernel

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

    # The reference DAVIS reader enumerates sequences from the ImageSet file
    # at construction; point it at a subset list, then restore.
    lst = os.path.join(root, "ImageSets", "2017", "val.txt")
    with open(lst) as f:
        full = f.read()
    try:
        with open(lst, "w") as f:
            f.write("\n".join(names[:n_seqs]) + "\n")
        ev = DAVISEvaluation(root, "unsupervised", "val", year="2017")
        t0 = time.time()
        ev.evaluate(res)
        return time.time() - t0
    finally:
        with open(lst, "w") as f:
            f.write(full)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seqs", type=int, default=20)
    ap.add_argument("--frames", type=int, default=69)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 854))
    ap.add_argument("--objects", type=int, default=1)
    ap.add_argument("--proposals", type=int, default=20)
    ap.add_argument(
        "--reference-seqs", type=int, default=2,
        help="also time the vendored reference scorer on this many sequences "
        "of the same tree (0 = skip)",
    )
    args = ap.parse_args()

    from slowfast_vos_tpu.eval.scorer import DavisScorer

    tmp = tempfile.mkdtemp(prefix="bench_scorer_")
    root, res = os.path.join(tmp, "DAVIS"), os.path.join(tmp, "res")
    t0 = time.time()
    names = build_tree(
        root, res, args.seqs, args.frames, tuple(args.hw), args.objects, args.proposals
    )
    gen_s = time.time() - t0

    scorer = DavisScorer(root, task="unsupervised", gt_set="val", year="2017")
    t0 = time.time()
    scorer.evaluate(res)
    ours_s = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "scorer_unsup_jf_wall_s",
                "value": round(ours_s, 2),
                "unit": "s",
                "vs_baseline": round(REFERENCE_WALL_S / ours_s, 2),
                "seqs": args.seqs,
                "frames": args.frames,
                "proposals": args.proposals,
                "tree_gen_s": round(gen_s, 1),
                "note": "vs_baseline uses the reference's published local "
                "timing (different hardware); see reference_same_host line",
            }
        )
    )

    if args.reference_seqs:
        n = min(args.reference_seqs, args.seqs)
        ref_s = time_reference(root, res, n, names)
        t0 = time.time()
        DavisScorer(
            root, task="unsupervised", gt_set="val", year="2017", sequences=names[:n]
        ).evaluate(res)
        ours_sub_s = time.time() - t0
        print(
            json.dumps(
                {
                    "metric": "scorer_reference_same_host_ratio",
                    "value": round(ref_s / ours_sub_s, 2),
                    "unit": "x",
                    "reference_s": round(ref_s, 2),
                    "ours_s": round(ours_sub_s, 2),
                    "seqs": n,
                }
            )
        )


if __name__ == "__main__":
    main()
