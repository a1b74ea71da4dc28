"""Synthetic DAVIS-format data generator.

Real DAVIS data is not shipped with the repo; this module creates small but
structurally faithful DAVIS trees (JPEGImages / Annotations palette PNGs /
ImageSets in both 2016 and 2017 layouts) with moving-blob objects, used by
tests, the example scripts, and the benchmark when no real data is present.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from slowfast_vos_tpu.data.davis import save_palette_mask


def _draw_sequence(rng, t, h, w, num_objects):
    """Moving soft blobs on a textured background; returns (images, id_masks)."""
    yy, xx = np.mgrid[0:h, 0:w]
    images = np.zeros((t, h, w, 3), np.uint8)
    id_masks = np.zeros((t, h, w), np.uint8)
    bg = (rng.uniform(0, 80, (h, w, 3))).astype(np.uint8)

    centers = rng.uniform([0.25 * w, 0.25 * h], [0.75 * w, 0.75 * h], (num_objects, 2))
    vels = rng.uniform(-3, 3, (num_objects, 2))
    radii = rng.uniform(min(h, w) * 0.08, min(h, w) * 0.2, num_objects)
    colors = rng.integers(120, 255, (num_objects, 3))

    for f in range(t):
        frame = bg.copy()
        ids = np.zeros((h, w), np.uint8)
        for o in range(num_objects):
            cx, cy = centers[o] + vels[o] * f
            r = radii[o]
            blob = ((xx - cx) ** 2 / (1.3 * r) ** 2 + (yy - cy) ** 2 / r**2) <= 1.0
            frame[blob] = colors[o]
            ids[blob] = o + 1
        images[f] = frame
        id_masks[f] = ids
    return images, id_masks


def make_synthetic_davis(
    root: str,
    *,
    num_sequences: int = 2,
    frames: int = 12,
    hw: tuple[int, int] = (60, 100),
    num_objects: int = 2,
    year: str = "2017",
    subset: str | None = "train",
    seed: int = 63,
    resolution: str = "480p",
    start: int = 0,
):
    """Create a synthetic DAVIS tree under `root`. Returns sequence names.

    `hw` may be one (h, w) for a uniform-resolution tree, or a list of
    per-sequence (h, w) pairs (cycled) to build a mixed-resolution tree —
    used to exercise the aspect-grouped batching path. Call again with
    `start` past the existing count (and a different `subset`, or None for
    sequences in no ImageSet) to extend a tree with more subsets — the
    frame-level dataset splits by ImageSet membership like the reference
    (`maskrcnn_src.py:30-52`)."""
    rng = np.random.default_rng(seed)
    hws = hw if isinstance(hw, list) else [hw]
    names = []
    img_lines = []
    for s in range(num_sequences):
        h, w = hws[s % len(hws)]
        name = f"synth{start + s:02d}"
        names.append(name)
        img_dir = os.path.join(root, "JPEGImages", resolution, name)
        msk_dir = os.path.join(root, "Annotations", resolution, name)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(msk_dir, exist_ok=True)
        images, id_masks = _draw_sequence(rng, frames, h, w, num_objects)
        for f in range(frames):
            Image.fromarray(images[f]).save(os.path.join(img_dir, f"{f:05d}.jpg"))
            save_palette_mask(id_masks[f], os.path.join(msk_dir, f"{f:05d}.png"))
            img_lines.append(
                f"/JPEGImages/{resolution}/{name}/{f:05d}.jpg "
                f"/Annotations/{resolution}/{name}/{f:05d}.png"
            )

    if subset is not None:
        if year == "2017":
            sets_dir = os.path.join(root, "ImageSets", "2017")
            os.makedirs(sets_dir, exist_ok=True)
            with open(os.path.join(sets_dir, f"{subset}.txt"), "w") as f:
                f.write("\n".join(names) + "\n")
        else:
            sets_dir = os.path.join(root, "ImageSets", resolution)
            os.makedirs(sets_dir, exist_ok=True)
            with open(os.path.join(sets_dir, f"{subset}.txt"), "w") as f:
                f.write("\n".join(img_lines) + "\n")
    return names
