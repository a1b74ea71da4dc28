#!/usr/bin/env python
"""Device-side stage breakdown of the inference superchunk + wall-clock
decomposition (upload / compute / fetch) on the current backend.

Run on TPU:  python scripts/profile_pipeline.py [--superchunk 32]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, n=3, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--superchunk", type=int, default=32)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from slowfast_vos_tpu.models.rpn import filter_proposals

    pipe, model = build_pipeline(
        args.slow, args.fast, (480, 854), superchunk=args.superchunk
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(63)

    f = pipe.sf.fast
    sc = args.superchunk
    win_np = rng.integers(0, 255, (sc + f - 1, 480, 854, 3), dtype=np.uint8)
    valid_np = np.ones((sc + f - 1,), bool)

    # ---- wall-clock decomposition -----------------------------------------
    print("== wall-clock decomposition ==")
    _, t_up = timed(lambda: jax.device_put(win_np))
    print(f"upload {win_np.nbytes/1e6:.1f} MB window: {t_up*1e3:8.1f} ms "
          f"({win_np.nbytes/t_up/1e6:.0f} MB/s)")

    win = jax.device_put(win_np)
    valid = jax.device_put(valid_np)
    out, t_sc = timed(pipe._superchunk, variables, win, valid)
    print(f"superchunk compute (device-resident): {t_sc*1e3:8.1f} ms "
          f"= {sc/t_sc:.1f} fps device-side")
    _, t_fetch = timed(lambda: jax.device_get(out))
    print(f"fetch packed outputs: {t_fetch*1e3:8.1f} ms")

    # end-to-end like bench.py
    clip = rng.integers(0, 255, (args.frames, 480, 854, 3), dtype=np.uint8)
    pipe.infer_sequence(variables, clip[: sc])  # warm both remainder shapes
    for _ in range(2):
        t0 = time.perf_counter()
        dets = pipe.infer_sequence(variables, clip)
        dt = time.perf_counter() - t0
        print(f"infer_sequence({args.frames}): {dt*1e3:8.1f} ms = {args.frames/dt:.1f} fps")
    del dets

    # ---- device-side stages ------------------------------------------------
    print("== device stages (per superchunk) ==")
    canvas, t = timed(jax.jit(pipe.transform), win)
    print(f"transform (resize+normalize): {t*1e3:8.1f} ms")

    bb = jax.jit(lambda v, c: model.apply(v, c, method="backbone_feats"))
    feats, t = timed(bb, variables, canvas)
    print(f"backbone: {t*1e3:8.1f} ms")

    center = slice(pipe.halo_left, pipe.halo_left + sc)
    center_feats = [fl[center] for fl in feats]

    rpn_fn = jax.jit(
        lambda v, fs: filter_proposals(
            *model.apply(v, fs, method="rpn_predict"),
            self_anchors := None or pipe.anchors,
            image_hw=pipe.image_hw, cfg=pipe.cfg, training=False,
        )
    )
    (proposals, _s, pvalid), t = timed(rpn_fn, variables, center_feats)
    print(f"rpn heads + proposal filter (incl NMS): {t*1e3:8.1f} ms")

    enh = jax.jit(
        lambda v, fs: model.apply(v, fs, method="enhance", train=False, pre_padded=True)
    )
    enhanced, t = timed(enh, variables, [fl[: ] for fl in feats[:4]])
    print(f"slowfast enhance: {t*1e3:8.1f} ms")

    roi = jax.jit(pipe._roi_forward)
    (boxes, scores, labels, dvalid, mask_probs), t = timed(
        roi, variables, enhanced, proposals, pvalid
    )
    print(f"roi forward (pool7+box+post+pool14+mask): {t*1e3:8.1f} ms")

    fin = jax.jit(pipe._finalize_impl)
    _, t = timed(fin, boxes, scores, labels, dvalid, mask_probs)
    print(f"finalize (paste+pack): {t*1e3:8.1f} ms")

    # roi sub-stages
    from slowfast_vos_tpu.ops.roi_align import multiscale_roi_align

    ROI_SCALES = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    pool7 = jax.jit(
        lambda e, pr: jax.lax.map(
            lambda a: multiscale_roi_align(
                [a[0], a[1], a[2], a[3]], a[4], ROI_SCALES, output_size=7
            ),
            (*e, pr),
        )
    )
    pooled7, t = timed(pool7, enhanced, proposals)
    print(f"  pool 7x7 ({proposals.shape[0]}x{proposals.shape[1]} rois): {t*1e3:8.1f} ms")

    pool14 = jax.jit(
        lambda e, bx: jax.lax.map(
            lambda a: multiscale_roi_align(
                [a[0], a[1], a[2], a[3]], a[4], ROI_SCALES, output_size=14
            ),
            (*e, bx),
        )
    )
    _, t = timed(pool14, enhanced, boxes)
    print(f"  pool 14x14 ({boxes.shape[0]}x{boxes.shape[1]} rois): {t*1e3:8.1f} ms")

    e, pnum = proposals.shape[:2]
    box_fn = jax.jit(
        lambda v, p: model.apply(
            v, p.reshape(e * pnum, 7, 7, p.shape[-1]), method="box_predict"
        )
    )
    _, t = timed(box_fn, variables, pooled7)
    print(f"  box head ({e*pnum} rois): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
