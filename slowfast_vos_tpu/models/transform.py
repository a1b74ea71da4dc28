"""Image/target preprocessing: normalize, resize, pad to a static canvas.

Equivalent of torchvision's `GeneralizedRCNNTransform`, which the reference
invokes explicitly at `code/helpers/model.py:283` (resize min-side>=800 /
max-side<=1333 + ImageNet normalization) and whose `postprocess` it calls at
`model.py:347` to map detections back to original resolution.

TPU-first differences:
* the output canvas is STATIC (configurable; DAVIS's uniform 854x480 frames
  resize to 749x1333 and pad to 768x1344), so the whole downstream graph
  compiles once;
* whole clips [T, H, W, 3] are transformed in one fused device op — resize,
  normalize and pad all ride HBM bandwidth exactly once;
* postprocess rescales boxes and samples masks directly at original resolution
  (see ops/paste_masks.py) instead of torch's CPU-bound paste loop.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_scale(orig_hw: tuple[int, int], min_size: int = 800, max_size: int = 1333) -> float:
    """torchvision rule: scale min side to `min_size` unless the max side would
    exceed `max_size`. Computed host-side; static per dataset."""
    h, w = orig_hw
    return min(min_size / min(h, w), max_size / max(h, w))


def resized_hw(orig_hw: tuple[int, int], min_size: int = 800, max_size: int = 1333) -> tuple[int, int]:
    """torchvision floors: F.interpolate(scale_factor=s,
    recompute_scale_factor=True) emits floor(dim * s) (DAVIS 480x854 ->
    749x1333; e.g. 500x889 -> 749x1333, where round() would give 750)."""
    s = resize_scale(orig_hw, min_size, max_size)
    return math.floor(orig_hw[0] * s), math.floor(orig_hw[1] * s)


def canvas_for(orig_hw: tuple[int, int], min_size: int = 800, max_size: int = 1333, divisor: int = 64) -> tuple[int, int]:
    """Static padded canvas: resized size rounded up to `divisor` (64 keeps the
    stride-64 P6 level exactly aligned)."""
    rh, rw = resized_hw(orig_hw, min_size, max_size)
    rup = lambda v: -(-v // divisor) * divisor
    return rup(rh), rup(rw)


@dataclasses.dataclass(frozen=True)
class ImageTransform:
    """Static-shape clip transform. All sizes resolved at Python time."""

    original_hw: tuple[int, int]
    min_size: int = 800
    max_size: int = 1333
    divisor: int = 64

    @property
    def scale(self) -> float:
        return resize_scale(self.original_hw, self.min_size, self.max_size)

    @property
    def resized_hw(self) -> tuple[int, int]:
        return resized_hw(self.original_hw, self.min_size, self.max_size)

    @property
    def canvas_hw(self) -> tuple[int, int]:
        return canvas_for(self.original_hw, self.min_size, self.max_size, self.divisor)

    @functools.cached_property
    def _jitted(self):
        rh, rw = self.resized_hw
        ch, cw = self.canvas_hw
        # numpy constants: this property may first be touched while an OUTER
        # jit trace is active, and jnp constants created there would be
        # tracers leaking into the cached closure.
        import numpy as np

        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)

        @jax.jit
        def run(images):
            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0
            x = (x - mean) / std
            t = x.shape[0]
            # antialias=False: torchvision-era F.interpolate(bilinear) has no
            # antialiasing; matters only when downscaling (e.g. 1080p inputs).
            x = jax.image.resize(x, (t, rh, rw, 3), method="bilinear", antialias=False)
            return jnp.pad(x, ((0, 0), (0, ch - rh), (0, cw - rw), (0, 0)))

        return run

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [T, H, W, 3], uint8 or float in [0,1] -> [T, Hc, Wc, 3]
        normalized. uint8 input is preferred: it quarters host->device
        transfer volume and the /255 fuses into the normalize on device."""
        return self._jitted(images)

    @property
    def _box_ratios(self) -> tuple[float, float]:
        # Per-axis ratios of the *rounded* resized size, like torchvision's
        # resize_boxes (sub-pixel different from the nominal scale).
        rh, rw = self.resized_hw
        h, w = self.original_hw
        return rh / h, rw / w

    def transform_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """Original-resolution XYXY -> canvas resolution."""
        ry, rx = self._box_ratios
        return boxes * jnp.asarray([rx, ry, rx, ry], boxes.dtype)

    def transform_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """[N, H, W] binary masks -> resized (un-padded coords are identical to
        padded since padding is bottom/right)."""
        n = masks.shape[0]
        rh, rw = self.resized_hw
        out = jax.image.resize(masks.astype(jnp.float32), (n, rh, rw), method="bilinear")
        return (out >= 0.5).astype(jnp.float32)

    def inverse_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """Canvas resolution -> original resolution (postprocess step)."""
        ry, rx = self._box_ratios
        return boxes / jnp.asarray([rx, ry, rx, ry], boxes.dtype)
