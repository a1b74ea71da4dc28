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

This environment has no torchvision, so the script exits with guidance if the
import fails; it is round-2 tooling shipped ahead of the data.
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="reference .pth (2-class Mask R-CNN)")
    p.add_argument("--image", required=True, help="a DAVIS jpg frame")
    p.add_argument("--out", default="tests/goldens/maskrcnn_goldens.npz")
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

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **captured)
    print(f"captured {len(captured)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
