#!/usr/bin/env python
"""DAVIS evaluation CLI — run the model over DAVIS-2016 val, write result PNGs
and score J&F (the `helpers/davis_evaluate.py` workload)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--davis-root", required=True)
    p.add_argument("--results-root", default="output/results")
    p.add_argument("--checkpoint", required=True, help="TrainState/variables checkpoint or .pth")
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=3)
    p.add_argument("--year", default="2016")
    p.add_argument("--subset", default="val")
    p.add_argument("--sequence", default=None, help="single sequence = semi-supervised task")
    p.add_argument("--original-hw", type=int, nargs=2, default=(480, 854))
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.eval.glue import davis_evaluation
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from slowfast_vos_tpu.parallel.distributed import init_distributed_mode

    # Multi-process launches shard the sequence list (round-robin) inside
    # davis_evaluation; single-process this is a no-op.
    init_distributed_mode()

    pipe, model = build_pipeline(args.slow, args.fast, tuple(args.original_hw))
    variables = init_variables(model, jax.random.PRNGKey(0))
    from scripts.train import _load_init

    variables = _load_init(args.checkpoint, variables)

    jf, summary, per_object, wall = davis_evaluation(
        pipe,
        variables,
        davis_root=args.davis_root,
        results_root=args.results_root,
        model_name=f"slowfast_{args.slow}-{args.fast}",
        sequences=args.sequence,
        subset=args.subset,
        year=args.year,
    )
    print("--------------------------- Global results ---------------------------")
    for k, v in summary.items():
        print(f"{k}: {v:.4f}")
    print("---------- Per sequence ----------")
    for name, vals in per_object.items():
        print(f"{name}: J={vals['J-Mean']:.4f} F={vals['F-Mean']:.4f}")
    print(f"Total time: {wall:.1f}s")


if __name__ == "__main__":
    main()
