#!/usr/bin/env python
"""End-to-end demo on synthetic DAVIS data: build the flagship model, run
sequence inference, write DAVIS-layout result masks, score them with the
official J&F protocol, and show per-stage timing.

Run: python examples/demo_inference.py [--full-res]
(no real DAVIS data or trained weights required)
"""
import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--full-res", action="store_true", help="use 480x854 DAVIS resolution")
    p.add_argument("--frames", type=int, default=12)
    args = p.parse_args()

    from slowfast_vos_tpu.data.davis import DavisIndex, load_sequence
    from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
    from slowfast_vos_tpu.eval.glue import davis_evaluation
    from slowfast_vos_tpu.models.config import DetectionConfig
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    hw = (480, 854) if args.full_res else (120, 200)
    sizes = {} if args.full_res else {"min_size": 128, "max_size": 256}
    cfg = None if args.full_res else DetectionConfig(
        rpn_pre_nms_top_n_test=256, rpn_post_nms_top_n_test=128, detections_per_img=5
    )

    root = tempfile.mkdtemp(prefix="demo_davis_")
    make_synthetic_davis(
        root, num_sequences=1, frames=args.frames, hw=hw, num_objects=1,
        year="2016", subset="val",
    )
    print(f"synthetic DAVIS-2016 tree at {root}")

    pipe, model = build_pipeline(slow=3, fast=3, original_hw=hw, cfg=cfg, **sizes)
    variables = init_variables(model, jax.random.PRNGKey(63))
    print(f"model: slowfast 3-3, canvas {pipe.transform.canvas_hw}, devices {jax.devices()}")

    # Warm-up (compiles), then timed inference
    idx = DavisIndex(root, "val", year="2016")
    seq = load_sequence(idx.sequences[0], max_gt=pipe.cfg.max_gt)
    t0 = time.time()
    dets = pipe.infer_sequence(variables, seq["images"])
    print(f"cold inference: {time.time() - t0:.1f}s for {len(dets)} frames")
    t0 = time.time()
    dets = pipe.infer_sequence(variables, seq["images"])
    dt = time.time() - t0
    print(f"warm inference: {dt:.2f}s -> {len(dets) / dt:.1f} frames/s")

    jf, summary, _per, wall = davis_evaluation(
        pipe, variables,
        davis_root=root, results_root=os.path.join(root, "results"),
        model_name="demo", year="2016",
    )
    print(f"J&F (random weights, synthetic data): {jf:.3f}  "
          f"[J={summary['J-Mean']:.3f} F={summary['F-Mean']:.3f}] in {wall:.1f}s")
    print(f"result masks: {root}/results/unsupervised/demo/")


if __name__ == "__main__":
    main()
