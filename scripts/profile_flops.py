#!/usr/bin/env python
"""Analytic model-FLOPs-per-frame for the inference pipeline, per config.

Feeds the `device_mfu` column in bench.py: MFU = model_flops_per_frame *
device_fps / peak. "Model FLOPs" are the REQUIRED multiply-add FLOPs of the
model's convs/matmuls (2 * out_px * k*k * cin * cout), not the FLOPs any
particular implementation spends — implementation overheads (the variant-G
merged stage-1 computing slow taps over F-S extra frames, the separable-
matmul RoIAlign/paste forms, gathers, NMS) show up as LOWER mfu, which is
the point of the diagnostic.

Counted: backbone (ResNet50 at the 768x1344 canvas), FPN, RPN head, SlowFast
enhance (per config, levels P2-P5), box head (rpn_post_nms_top_n_test rois),
mask head (detections_per_img rois). Not counted (sub-1%): image transform
resize taps, proposal decode/NMS, mask paste, scoring.

No jax/device needed — pure arithmetic. Cross-check: the ResNet50 subtotal
at 224x224 should land near the published 4.1 GMACs (8.2 GFLOPs).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.slowfast import fuse_kernel_size, pathway_kernel_sizes


def conv(hw, k, cin, cout):
    return 2 * hw[0] * hw[1] * k * k * cin * cout


def resnet50(canvas):
    h, w = canvas
    total = conv((h // 2, w // 2), 7, 3, 64)  # stem
    hw = (h // 4, w // 4)  # after maxpool
    cin = 64
    for stage, (features, nblocks) in enumerate(
        [(64, 3), (128, 4), (256, 6), (512, 3)]
    ):
        if stage > 0:
            hw = (hw[0] // 2, hw[1] // 2)
        for i in range(nblocks):
            total += conv(hw, 1, cin if i == 0 else features * 4, features)
            total += conv(hw, 3, features, features)
            total += conv(hw, 1, features, features * 4)
            if i == 0:
                total += conv(hw, 1, cin, features * 4)  # projection
        cin = features * 4
    return total


def fpn_levels(canvas):
    h, w = canvas
    return [(h // s, w // s) for s in (4, 8, 16, 32, 64)]


def fpn(canvas):
    levels = fpn_levels(canvas)[:4]
    cins = [256, 512, 1024, 2048]
    total = sum(conv(hw, 1, cin, 256) for hw, cin in zip(levels, cins))  # laterals
    total += sum(conv(hw, 3, 256, 256) for hw in levels)  # smooths
    return total


def rpn_head(canvas):
    total = 0
    for hw in fpn_levels(canvas):  # all 5 levels incl. 'pool'
        total += conv(hw, 3, 256, 256)
        total += conv(hw, 1, 256, 3)  # objectness, 3 anchors
        total += conv(hw, 1, 256, 12)  # deltas
    return total


def enhance(canvas, slow, fast):
    """Per-frame FLOPs of the SlowFast temporal module over levels P2-P5.
    Each output frame of a kt-tap valid temporal conv is kt summed 2D convs
    (models/slowfast.py temporal_conv_apply)."""
    ks = pathway_kernel_sizes(slow)
    kf = pathway_kernel_sizes(fast)
    kfuse1, out_s1, out_f1 = fuse_kernel_size(slow, ks[0], fast, kf[0])
    kfuse2, _, _ = fuse_kernel_size(out_s1, ks[1], out_f1, kf[1])
    total = 0
    for hw in fpn_levels(canvas)[:4]:
        total += ks[0] * conv(hw, 3, 256, 192) + kf[0] * conv(hw, 3, 256, 32)
        total += kfuse1 * conv(hw, 1, 32, 64)
        total += ks[1] * conv(hw, 3, 256, 192) + kf[1] * conv(hw, 3, 32, 32)
        total += kfuse2 * conv(hw, 1, 32, 64)
        total += ks[2] * conv(hw, 3, 256, 224) + kf[2] * conv(hw, 3, 32, 32)
    return total


def box_head(cfg: DetectionConfig):
    per_roi = 2 * (7 * 7 * 256 * 1024 + 1024 * 1024 + 1024 * (cfg.num_classes * 5))
    return cfg.rpn_post_nms_top_n_test * per_roi


def mask_head(cfg: DetectionConfig):
    s = cfg.mask_roi_size
    per_roi = 4 * conv((s, s), 3, 256, 256)  # 4 conv3x3 at 14x14
    per_roi += 2 * 4 * 256 * 256 * (2 * s) * (2 * s)  # deconv 2x2/s2 to 28x28
    per_roi += conv((2 * s, 2 * s), 1, 256, cfg.num_classes)
    return cfg.detections_per_img * per_roi


def per_frame(slow, fast, canvas=(768, 1344), cfg=None):
    cfg = cfg or DetectionConfig()
    return {
        "backbone": resnet50(canvas),
        "fpn": fpn(canvas),
        "rpn_head": rpn_head(canvas),
        "enhance": enhance(canvas, slow, fast),
        "box_head": box_head(cfg),
        "mask_head": mask_head(cfg),
    }


def main():
    import argparse

    argparse.ArgumentParser(description=__doc__).parse_args()

    # sanity: ResNet50 at 224x224 ~ 8.2 GFLOPs (4.1 GMACs)
    r224 = resnet50((224, 224)) / 1e9
    assert 7.0 < r224 < 9.5, r224
    print(f"resnet50@224 sanity: {r224:.2f} GFLOPs (published ~8.2)\n")

    table = {}
    for slow, fast in [(1, 1), (3, 3), (7, 7), (1, 7), (3, 7)]:
        parts = per_frame(slow, fast)
        total = sum(parts.values())
        table[f"{slow}-{fast}"] = total
        breakdown = "  ".join(f"{k} {v / 1e9:6.1f}" for k, v in parts.items())
        print(f"{slow}-{fast}: {total / 1e9:7.1f} GFLOP/frame   {breakdown}")

    print("\nFLOPS_PER_FRAME = {")
    for k, v in table.items():
        print(f'    "{k}": {v / 1e9:.1f}e9,')
    print("}")


if __name__ == "__main__":
    main()
