#!/usr/bin/env python
"""Micro-benchmark of the image transform stage at production shape
([34, 480, 854, 3] uint8 -> normalized 768x1344 canvas) and a rewrite
candidate:

A. current: normalize -> jax.image.resize(bilinear) -> jnp.pad
   (the resize lowers to per-dim dot_general at precision=HIGHEST; the pad
   is a separate multi-GB f32 copy)
B. fused two-tap lerp: normalize -> x[lo]*w_lo + x[hi]*w_hi per dim with the
   canvas zero-pad folded into zero tap weights (no separate pad op)

CAUTION before productionizing B: on the round-3 CPU host, swapping the
transform formulation changed which consumer fusions XLA:CPU built around
the canvas and made the BACKBONE's per-frame outputs batch-size-dependent
at bf16 ulp, breaking the carry path's bit-exactness contract
(tests/test_pipeline_inference.py::test_carry_path_matches_plain_superchunks).
Any adoption must re-validate that test AND the TPU carry equivalence.

Run on TPU:  python scripts/profile_transform.py

SETTLED (round 4, TPU v5e, best of 3): A 34.7 ms, B 36.9 ms — B LOSES on
TPU as well; production keeps A. The staged variant is retired (kept here
only as the measurement record).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bilinear_taps(n_in, n_out, n_pad=0):
    import numpy as np

    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    lo = np.clip(np.floor(pos), 0, n_in - 1).astype(np.int32)
    hi = np.minimum(lo + 1, n_in - 1).astype(np.int32)
    frac = np.clip(pos - np.floor(pos), 0.0, 1.0)
    frac[pos < 0] = 0.0
    z = np.zeros(n_pad, np.float32)
    return (
        np.concatenate([lo, np.zeros(n_pad, np.int32)]),
        np.concatenate([hi, np.zeros(n_pad, np.int32)]),
        np.concatenate([(1.0 - frac).astype(np.float32), z]),
        np.concatenate([frac.astype(np.float32), z]),
    )


def main():
    import argparse

    argparse.ArgumentParser(description=__doc__).parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.transform import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        ImageTransform,
    )

    tr = ImageTransform((480, 854))
    rh, rw = tr.resized_hw
    ch, cw = tr.canvas_hw
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (34, 480, 854, 3), dtype=np.uint8))
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)

    def timeit(name, fn, *args):
        _ = float(jnp.sum(fn(*args)))  # compile + force fetch (tunnel timing rule)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best*1e3:8.1f} ms")

    timeit("A: current transform (jax.image.resize + pad)", tr, imgs)

    hlo, hhi, hwl, hwh = bilinear_taps(480, rh, ch - rh)
    wlo, whi, wwl, wwh = bilinear_taps(854, rw, cw - rw)

    @jax.jit
    def fused(images):
        x = images.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        x = x[:, hlo] * hwl[:, None, None] + x[:, hhi] * hwh[:, None, None]
        x = x[:, :, wlo] * wwl[:, None] + x[:, :, whi] * wwh[:, None]
        return jax.lax.optimization_barrier(x)

    timeit("B: fused two-tap lerp (pad folded, barrier-pinned)", fused, imgs)

    a = tr(imgs)
    b = fused(imgs)
    print(f"max |A-B|: {float(jnp.max(jnp.abs(a - b))):.2e}")


if __name__ == "__main__":
    main()
