#!/usr/bin/env python
"""Micro-benchmark (every variant reduced to a scalar in-graph: this
backend reports bogus ~0ms for large un-fetched outputs) of multiscale RoIAlign variants at production shapes:
32 frames x 1000 rois on the DAVIS pyramid (768x1344 canvas, C=256, bf16).

Variants: per-frame lax.map (current), grouped vmap-within-map, full vmap,
and the Pallas patch kernel.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pallas-only", action="store_true",
                    help="skip the XLA variants (fast kernel iteration)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.ops.roi_align import multiscale_roi_align
    from slowfast_vos_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

    SCALES = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    T, N, C = 32, 1000, 256
    hw = [(192, 336), (96, 168), (48, 84), (24, 42)]
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(T, h, w, C)).astype(np.float32), jnp.bfloat16)
        for h, w in hw
    ]
    # realistic roi mix: mostly small proposals (P2/P3) with a large tail
    sizes = np.where(
        rng.random((T, N, 1)) < 0.8,
        rng.uniform(8, 120, (T, N, 1)),
        rng.uniform(120, 700, (T, N, 1)),
    )
    x1 = rng.uniform(0, 1333 - 32, (T, N, 1))
    y1 = rng.uniform(0, 749 - 32, (T, N, 1))
    rois = jnp.asarray(
        np.concatenate(
            [x1, y1, np.minimum(x1 + sizes, 1333.0), np.minimum(y1 + sizes * rng.uniform(0.5, 2.0, (T, N, 1)), 749.0)],
            axis=-1,
        ),
        jnp.float32,
    )

    def timeit(name, fn, *args):
        # the tunnel backend defers execution until a device->host fetch
        # forces a flush, so every timed iteration must END with a scalar
        # fetch (block_until_ready alone reports ~0 ms for unfetched work);
        # the fetch adds one ~28 ms RTT, identical across variants.
        _ = float(jnp.sum(fn(*args)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:36s} {best*1e3:8.1f} ms  ({T*N/best/1e6:.1f} Mroi/s)")
        return out

    def pool_one(args):
        l0, l1, l2, l3, r = args
        return multiscale_roi_align([l0, l1, l2, l3], r, SCALES, output_size=7)

    if not args.pallas_only:
        ref = timeit(
            "lax.map per frame (current)",
            jax.jit(lambda f0, f1, f2, f3, r: jax.lax.map(pool_one, (f0, f1, f2, f3, r)).sum()),
            *feats, rois,
        )

        for g in (2, 4, 8):
            def grouped(f0, f1, f2, f3, r, g=g):
                rs = lambda x: x.reshape(T // g, g, *x.shape[1:])
                return jax.lax.map(
                    lambda a: jax.vmap(lambda l0, l1, l2, l3, rr: multiscale_roi_align(
                        [l0, l1, l2, l3], rr, SCALES, output_size=7))(*a),
                    (rs(f0), rs(f1), rs(f2), rs(f3), rs(r)),
                ).sum()
            out = timeit(f"map over {T//g} groups of vmap {g}", jax.jit(grouped), *feats, rois)
            del out

        try:
            out = timeit(
                "full vmap",
                jax.jit(lambda f0, f1, f2, f3, r: jax.vmap(
                    lambda l0, l1, l2, l3, rr: multiscale_roi_align([l0, l1, l2, l3], rr, SCALES, output_size=7)
                )(f0, f1, f2, f3, r).sum()),
                *feats, rois,
            )
            del out
        except Exception as e:
            print("full vmap failed:", type(e).__name__, str(e)[:120])

    try:
        out = timeit(
            "pallas patch kernel (per frame)",
            jax.jit(lambda f0, f1, f2, f3, r: jax.lax.map(
                lambda a: multiscale_roi_align_pallas([a[0], a[1], a[2], a[3]], a[4], SCALES, output_size=7),
                (f0, f1, f2, f3, r),
            ).sum()),
            *feats, rois,
        )
        del out
    except Exception as e:
        print("pallas failed:", type(e).__name__, str(e)[:200])

    from slowfast_vos_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas_clip

    try:
        out = timeit(
            "pallas whole-clip kernel",
            jax.jit(lambda f0, f1, f2, f3, r: multiscale_roi_align_pallas_clip(
                [f0, f1, f2, f3], r, SCALES, output_size=7
            ).sum()),
            *feats, rois,
        )
        del out
    except Exception as e:
        print("pallas clip failed:", type(e).__name__, str(e)[:200])



if __name__ == "__main__":
    main()
