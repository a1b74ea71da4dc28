"""Frame-level DAVIS dataset for the Mask R-CNN fine-tune path.

Rebuild of the reference `DavisDataset` (`code/maskrcnn/maskrcnn_src.py:21-161`):
a flat index over all frames of all sequences with train/val/test splits by
index stride (the reference uses fixed index lists; we use the same 80/10/10
spirit deterministically), plus batching into Trainer windows with fast=1 so
each batch is just independent frames.

Mixed-resolution datasets batch through `data/grouping.py` (the reference's
`GroupedBatchSampler`, `code/maskrcnn/group_by_aspect_ratio.py:23-196`): each
batch draws from one quantized aspect bucket and is zero-padded bottom/right
to a shared canvas rounded up to `size_divisor` (torchvision's
`batch_images(size_divisible=32)` convention) — so the number of compiled
canvases is bounded by the bucket count, not the image count. Single-
resolution data (DAVIS) takes the original fast path, bit-identical to
before.
"""
from __future__ import annotations

import numpy as np

from slowfast_vos_tpu.data.davis import DavisIndex, decode_frame_annotation
from slowfast_vos_tpu.data.grouping import group_by_aspect_ratio
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
        self._sizes: list[tuple[int, int]] | None = None

    def __len__(self):
        return len(self.frames)

    def sizes(self) -> list[tuple[int, int]]:
        """(h, w) per frame from the image headers (no pixel decode)."""
        if self._sizes is None:
            sizes = []
            for img_path, _ in self.frames:
                with Image.open(img_path) as im:
                    w, h = im.size
                sizes.append((h, w))
            self._sizes = sizes
        return self._sizes

    def __getitem__(self, idx):
        img_path, mask_path = self.frames[idx]
        image = np.array(Image.open(img_path).convert("RGB"))
        boxes, masks, valid = decode_frame_annotation(mask_path, self.max_gt)
        return {"image": image, "boxes": boxes, "masks": masks, "gt_valid": valid}


def _assemble(items, batch_size, canvas_hw=None):
    """Stack items into one Trainer window batch, zero-padding images/masks
    bottom/right to `canvas_hw` when given (boxes are top-left anchored, so
    they need no shift — torchvision's batch_images convention)."""
    if canvas_hw is None:
        images = np.stack([it["image"] for it in items])
        masks = np.stack([it["masks"] for it in items])
    else:
        ch, cw = canvas_hw
        images = np.zeros((batch_size, ch, cw, 3), items[0]["image"].dtype)
        masks = np.zeros(
            (batch_size, items[0]["masks"].shape[0], ch, cw), items[0]["masks"].dtype
        )
        for j, it in enumerate(items):
            h, w = it["image"].shape[:2]
            images[j, :h, :w] = it["image"]
            masks[j, :, :h, :w] = it["masks"]
    gt_valid = np.stack([it["gt_valid"] for it in items])
    return {
        "images": images,
        "feat_valid": np.ones((batch_size,), bool),
        "frame_valid": gt_valid.any(axis=1),
        "boxes": np.stack([it["boxes"] for it in items]),
        "labels": np.ones(gt_valid.shape, np.int32),
        "gt_valid": gt_valid,
        "masks": masks,
    }


def frame_batches(
    dataset: DavisFrameDataset,
    batch_size: int = 2,
    *,
    shuffle=True,
    seed=0,
    size_divisor: int = 32,
):
    """Yield Trainer-compatible batches of independent frames (fast=1 =>
    window == the frames themselves, no halo).

    Uniform-resolution datasets keep the original shuffled-sequential order;
    mixed-resolution datasets batch per aspect bucket on a shared padded
    canvas (see module docstring). Tail batches smaller than `batch_size`
    are dropped in both paths (static shapes)."""
    sizes = dataset.sizes() if hasattr(dataset, "sizes") else None
    if sizes is None or len(set(sizes)) <= 1:
        order = np.arange(len(dataset))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in order[start : start + batch_size]]
            yield _assemble(items, batch_size)
        return

    # One canvas per aspect BUCKET (not per batch): the compiled-graph count
    # is bounded by the bucket count regardless of how sizes interleave.
    rup = lambda v: -(-v // size_divisor) * size_divisor
    groups = group_by_aspect_ratio(sizes)
    rng = np.random.default_rng(seed)
    for _gid, idxs in sorted(groups.items()):
        canvas = (
            rup(max(sizes[i][0] for i in idxs)),
            rup(max(sizes[i][1] for i in idxs)),
        )
        idxs = list(idxs)
        if shuffle:
            rng.shuffle(idxs)
        for s in range(0, len(idxs) - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in idxs[s : s + batch_size]]
            yield _assemble(items, batch_size, canvas)
