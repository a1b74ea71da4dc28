"""Frame-level DAVIS dataset for the Mask R-CNN fine-tune path.

Rebuild of the reference `DavisDataset` (`code/maskrcnn/maskrcnn_src.py:21-161`):
a flat index over all frames of all sequences with train/val/test splits by
index stride (the reference uses fixed index lists; we use the same 80/10/10
spirit deterministically), plus batching into Trainer windows with fast=1 so
each batch is just independent frames.
"""
from __future__ import annotations

import numpy as np

from slowfast_vos_tpu.data.davis import DavisIndex, decode_frame_annotation
from PIL import Image


class DavisFrameDataset:
    def __init__(
        self,
        root: str,
        split: str = "train",
        *,
        year: str = "2017",
        subset: str = "train",
        max_gt: int = 8,
        seed: int = 63,
    ):
        index = DavisIndex(root, subset, year=year)
        all_frames = [
            (info.images[i], info.masks[i])
            for info in index
            for i in range(len(info.images))
        ]
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(all_frames))
        n = len(all_frames)
        n_train = int(0.8 * n)
        n_val = int(0.1 * n)
        sel = {
            "train": order[:n_train],
            "val": order[n_train : n_train + n_val],
            "test": order[n_train + n_val :],
        }[split]
        self.frames = [all_frames[i] for i in sel]
        self.max_gt = max_gt

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        img_path, mask_path = self.frames[idx]
        image = np.array(Image.open(img_path).convert("RGB"))
        boxes, masks, valid = decode_frame_annotation(mask_path, self.max_gt)
        return {"image": image, "boxes": boxes, "masks": masks, "gt_valid": valid}


def frame_batches(dataset: DavisFrameDataset, batch_size: int = 2, *, shuffle=True, seed=0):
    """Yield Trainer-compatible batches of independent frames (fast=1 =>
    window == the frames themselves, no halo)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for start in range(0, len(order) - batch_size + 1, batch_size):
        items = [dataset[int(i)] for i in order[start : start + batch_size]]
        images = np.stack([it["image"] for it in items])
        gt_valid = np.stack([it["gt_valid"] for it in items])
        yield {
            "images": images,
            "feat_valid": np.ones((batch_size,), bool),
            "frame_valid": gt_valid.any(axis=1),
            "boxes": np.stack([it["boxes"] for it in items]),
            "labels": np.ones(gt_valid.shape, np.int32),
            "gt_valid": gt_valid,
            "masks": np.stack([it["masks"] for it in items]),
        }
