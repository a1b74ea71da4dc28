#!/usr/bin/env python
"""Capture per-stage golden activations from a REFERENCE torchvision Mask
R-CNN for numeric-parity testing (SURVEY.md §7 hard-part (a)).

Run this in an environment that HAS torchvision + the reference weights:

    python scripts/capture_goldens.py --checkpoint maskrcnn_model.pth \
        --image some_davis_frame.jpg --out tests/goldens/maskrcnn_goldens.npz

It records: the preprocessed tensor, each FPN level, RPN objectness/deltas,
the final proposals, detections (boxes/scores/labels) and mask probabilities.
`tests/test_goldens.py` replays the same image through this framework with
the converted weights and asserts stage-by-stage closeness — closing the last
parity risk (resize conventions, NMS tie-breaking) once real weights exist.

The npz carries a `manifest` (JSON list) enumerating which PRODUCTION graphs
of this framework the captured arrays exercise, so the day-one parity run
provably covers the shipped code paths (VERDICT r4 item 7):
  * `stem_7x7`             — the standard 7x7/s2 stem (production default,
                             `models/resnet_fpn.py ResNet50.s2d_stem=False`)
  * `fpn_dilated_p2_combine` — the never-materialized P2 top-down combine
                             (`models/resnet_fpn.py FPN`)
  * `enhance_<s>-<f>`      — (with --slowfast-checkpoint) the SlowFast
                             temporal module; for s != f this is the
                             variant-G merged stage-1 eval path
                             (`models/slowfast.py`).

With `--slowfast-checkpoint` (a full reference checkpoint carrying
`slow_fast.*` keys, `code/train.py:112-121`) and `--reference-repo`
(the reference's `code/` dir on sys.path) it additionally runs the
reference `SlowFastLayers` (`code/helpers/model.py:30-149`) on a seeded
synthetic feature window and records input + fused output for
`tests/test_goldens.py::test_enhance_parity`.

This environment has no torchvision, so the script exits with guidance if the
import fails; it is round-2 tooling shipped ahead of the data.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="reference .pth (2-class Mask R-CNN)")
    p.add_argument("--image", required=True, help="a DAVIS jpg frame")
    p.add_argument("--out", default="tests/goldens/maskrcnn_goldens.npz")
    p.add_argument(
        "--slowfast-checkpoint", default=None,
        help="full reference checkpoint with slow_fast.* keys; enables the "
        "SlowFast enhance golden (variant-G path when --slow != --fast)",
    )
    p.add_argument(
        "--reference-repo", default=None,
        help="path to the reference repo's code/ dir (for `helpers.model`)",
    )
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=7)
    args = p.parse_args()

    try:
        import torch
        import torchvision
        from torchvision.models.detection import maskrcnn_resnet50_fpn
        from torchvision.models.detection.faster_rcnn import FastRCNNPredictor
        from torchvision.models.detection.mask_rcnn import MaskRCNNPredictor
    except ImportError as e:
        print(f"torchvision required to capture goldens: {e}", file=sys.stderr)
        sys.exit(2)

    from PIL import Image

    model = maskrcnn_resnet50_fpn(weights=None)
    in_features = model.roi_heads.box_predictor.cls_score.in_features
    model.roi_heads.box_predictor = FastRCNNPredictor(in_features, 2)
    in_mask = model.roi_heads.mask_predictor.conv5_mask.in_channels
    model.roi_heads.mask_predictor = MaskRCNNPredictor(in_mask, 256, 2)
    model.load_state_dict(torch.load(args.checkpoint, map_location="cpu"))
    model.eval()
    model.roi_heads.detections_per_img = 10

    img = np.array(Image.open(args.image).convert("RGB"))
    tensor = torch.tensor(img.transpose(2, 0, 1), dtype=torch.float32) / 255.0

    captured = {"image": img}
    with torch.no_grad():
        image_list, _ = model.transform([tensor])
        captured["preprocessed"] = image_list.tensors[0].numpy()
        feats = model.backbone(image_list.tensors)
        for k, v in feats.items():
            captured[f"fpn_{k}"] = v[0].numpy()
        objectness, deltas = model.rpn.head(list(feats.values()))
        for i, (o, d) in enumerate(zip(objectness, deltas)):
            captured[f"rpn_obj_{i}"] = o[0].numpy()
            captured[f"rpn_delta_{i}"] = d[0].numpy()
        proposals, _ = model.rpn(image_list, feats)
        captured["proposals"] = proposals[0].numpy()
        detections, _ = model.roi_heads(feats, proposals, image_list.image_sizes)
        detections = model.transform.postprocess(
            detections, image_list.image_sizes, [img.shape[:2]]
        )
        det = detections[0]
        captured["det_boxes"] = det["boxes"].numpy()
        captured["det_scores"] = det["scores"].numpy()
        captured["det_labels"] = det["labels"].numpy()
        captured["det_masks"] = det["masks"][:, 0].numpy()

    # Production graphs the arrays above exercise in tests/test_goldens.py:
    # the standard 7x7 stem + dilated P2 combine are on the backbone_feats
    # path every golden test drives.
    manifest = ["stem_7x7", "fpn_dilated_p2_combine", "rpn_filter", "roi_heads", "mask_paste"]

    if args.slowfast_checkpoint:
        if args.reference_repo:
            sys.path.insert(0, args.reference_repo)
        from helpers.model import SlowFastLayers  # reference code/helpers/model.py

        sf = SlowFastLayers(256, "cpu", args.slow, args.fast)
        full_sd = torch.load(args.slowfast_checkpoint, map_location="cpu")
        sub = {
            k.split("slow_fast.", 1)[1]: v
            for k, v in full_sd.items()
            if k.startswith("slow_fast.")
        }
        sf.load_state_dict(sub, strict=True)
        sf.eval()
        rng = np.random.default_rng(63)
        h, w = 48, 80
        window = rng.normal(size=(args.fast, h, w, 256)).astype(np.float32)
        fast_t = torch.tensor(window.transpose(3, 0, 1, 2))[None]  # [1,C,F,H,W]
        d = args.fast // 2 - args.slow // 2
        slow_t = fast_t[:, :, d : d + args.slow]
        with torch.no_grad():
            s_out, f_out = sf(slow_t, fast_t)
            out = torch.cat([s_out, f_out], dim=1).squeeze(2)[0]  # [256,H,W]
        captured["enhance_window"] = window
        captured["enhance_out"] = out.numpy().transpose(1, 2, 0)
        captured["enhance_config"] = np.asarray([args.slow, args.fast])
        tag = f"enhance_{args.slow}-{args.fast}"
        manifest.append(tag + ("_variant_g" if args.slow != args.fast else "_merged_stage1"))

    captured["manifest"] = np.asarray(json.dumps(manifest))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **captured)
    print(f"captured {len(captured)} arrays -> {args.out}")
    print("manifest:", manifest)


if __name__ == "__main__":
    main()
