#!/usr/bin/env python
"""Prediction/visualization CLI — run the best model over DAVIS val, dump
per-frame IoU + overlay images (the `code/prediction.py` workload)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--davis-root", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out-dir", default="output/predictions")
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=3)
    p.add_argument("--year", default="2016")
    p.add_argument("--subset", default="val")
    p.add_argument("--save-all", action="store_true")
    p.add_argument("--original-hw", type=int, nargs=2, default=(480, 854))
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.eval.visualize import evaluate_with_visualization
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from scripts.train import _load_init

    pipe, model = build_pipeline(args.slow, args.fast, tuple(args.original_hw))
    variables = _load_init(args.checkpoint, init_variables(model, jax.random.PRNGKey(0)))
    miou = evaluate_with_visualization(
        pipe, variables, davis_root=args.davis_root, out_dir=args.out_dir,
        subset=args.subset, year=args.year, save_all_imgs=args.save_all,
    )
    print(f"mean IoU: {miou:.4f}; overlays in {args.out_dir}")


if __name__ == "__main__":
    main()
