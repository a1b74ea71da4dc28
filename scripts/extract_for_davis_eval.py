#!/usr/bin/env python
"""Headless mask extraction CLI — write the DAVIS results PNG layout without
scoring (the `code/extract_for_davis_eval.py` workload)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--davis-root", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=3)
    p.add_argument("--year", default="2016")
    p.add_argument("--subset", default="val")
    p.add_argument("--original-hw", type=int, nargs=2, default=(480, 854))
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.eval.glue import extract_masks
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from slowfast_vos_tpu.parallel.distributed import init_distributed_mode
    from scripts.train import _load_init

    # Multi-process launches split the sequence list round-robin (no-op
    # single-process).
    init_distributed_mode()

    pipe, model = build_pipeline(args.slow, args.fast, tuple(args.original_hw))
    variables = _load_init(args.checkpoint, init_variables(model, jax.random.PRNGKey(0)))
    extract_masks(
        pipe, variables, args.davis_root, args.out_dir,
        subset=args.subset, year=args.year, progress=lambda s: print(f"done {s}"),
    )


if __name__ == "__main__":
    main()
