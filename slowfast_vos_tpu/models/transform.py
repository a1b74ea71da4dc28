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

    @functools.cached_property
    def _jitted_yuv(self):
        rh, rw = self.resized_hw
        ch, cw = self.canvas_hw
        import numpy as np

        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)

        @jax.jit
        def run(y, uv):
            t, h, w = y.shape
            # Chroma upsample 2x with half-pixel centers, then STUDIO-range
            # BT.601 YCbCr -> RGB — the inverse of cv2 RGB2YUV_I420, which
            # emits Y in [16, 235] / chroma excursion 224 (verified against
            # cv2 on solid colors: white -> Y 235, black -> Y 16).
            yf = (y.astype(jnp.float32) - 16.0) * (255.0 / 219.0)
            uvf = jax.image.resize(
                uv.astype(jnp.float32), (t, h, w, 2), method="bilinear", antialias=False
            ) - 128.0
            cb = uvf[..., 0] * (255.0 / 224.0)
            cr = uvf[..., 1] * (255.0 / 224.0)
            r = yf + 1.402 * cr
            g = yf - 0.344136 * cb - 0.714136 * cr
            b = yf + 1.772 * cb
            x = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) / 255.0
            x = (x - mean) / std
            x = jax.image.resize(x, (t, rh, rw, 3), method="bilinear", antialias=False)
            return jnp.pad(x, ((0, 0), (0, ch - rh), (0, cw - rw), (0, 0)))

        return run

    def from_yuv420(self, y: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
        """YUV 4:2:0 planes -> the same normalized canvas as `__call__`.

        y: [T, H, W] uint8 luma; uv: [T, H/2, W/2, 2] uint8 chroma (Cb, Cr).
        The host<->device link is this pipeline's wall-clock bottleneck (a
        high-latency tunnel that does NOT overlap transfers with compute), so
        the transport format is a first-class knob: 4:2:0 halves the bytes of
        raw RGB, and DAVIS JPEGs are 4:2:0-subsampled to begin with, so the
        chroma loss mirrors what the source material already had. Produced on
        host by `rgb_to_yuv420`."""
        return self._jitted_yuv(y, uv)

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


def rgb_to_yuv420(images) -> tuple:
    """Host-side RGB -> planar YUV 4:2:0 (halves upload bytes; see
    `ImageTransform.from_yuv420`).

    images: [T, H, W, 3] uint8 with even H, W.
    Returns (y [T, H, W] uint8, uv [T, H/2, W/2, 2] uint8, Cb then Cr).
    """
    import cv2
    import numpy as np

    t, h, w = images.shape[:3]
    assert h % 2 == 0 and w % 2 == 0, "YUV 4:2:0 transport needs even H, W"
    y = np.empty((t, h, w), np.uint8)
    uv = np.empty((t, h // 2, w // 2, 2), np.uint8)
    qh = h // 4  # I420 chroma plane rows in the stacked [H*3/2, W] layout
    for i in range(t):
        i420 = cv2.cvtColor(images[i], cv2.COLOR_RGB2YUV_I420)  # [H*3/2, W]
        y[i] = i420[:h]
        uv[i, :, :, 0] = i420[h : h + qh].reshape(h // 2, w // 2)
        uv[i, :, :, 1] = i420[h + qh :].reshape(h // 2, w // 2)
    return y, uv
