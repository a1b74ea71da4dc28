#!/usr/bin/env python
"""OSVOS-style per-sequence online fine-tuning CLI (the
`code/osvos/train_osvos.py` / `run_osvos_for_all_seq.py` /
`run_osvos_experiments.py` workloads, selected via --mode)."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="single", choices=["single", "all", "experiments"])
    p.add_argument("--davis-root", required=True, help="DAVIS-2016 root")
    p.add_argument("--checkpoint", required=True, help="best unsupervised weights")
    p.add_argument("--sequence", default="bmx-trees")
    p.add_argument("--results-root", default="output/osvos_results")
    p.add_argument("--output-json", default="output/osvos_all_results.json")
    p.add_argument("--experiments-dir", default="output/osvos_experiments")
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=3)
    p.add_argument("--freeze", default="SF", choices=["none", "SF", "BB_SF"])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--original-hw", type=int, nargs=2, default=(480, 854))
    p.add_argument(
        "--parity-exact", action="store_true",
        help="reference-exact parity mode for J&F-gated runs: per-sequence "
        "fine-tunes run SERIALLY (no lockstep SPMD, whose bf16 step lowers "
        "differently under shard_map and drifts ~1%% rel in grads) and the "
        "model computes in float32. Slower; use for the RUNBOOK 0.5-pt gates.",
    )
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from slowfast_vos_tpu.parallel.distributed import init_distributed_mode
    from slowfast_vos_tpu.train.osvos import (
        ExperimentConfig,
        run_osvos_experiments,
        run_osvos_for_all_sequences,
        train_osvos_sequence,
    )
    from scripts.train import _load_init

    # Multi-process '--mode all' shards the per-sequence fine-tunes across
    # processes; the other modes run per-process serial. No-op single-process.
    init_distributed_mode()

    import jax.numpy as jnp

    pipe, model = build_pipeline(
        args.slow, args.fast, tuple(args.original_hw),
        dtype=jnp.float32 if args.parity_exact else jnp.bfloat16,
    )
    variables = init_variables(model, jax.random.PRNGKey(63))
    variables = _load_init(args.checkpoint, variables)
    cfg = ExperimentConfig(freeze=args.freeze, lr=args.lr, scale=args.scale, epochs=args.epochs)

    if args.mode == "single":
        results = train_osvos_sequence(
            pipe, variables, davis_root=args.davis_root,
            sequence_name=args.sequence, results_root=args.results_root, cfg=cfg,
        )
        print(json.dumps({str(k): v for k, v in results.items()}, indent=2))
    elif args.mode == "all":
        run_osvos_for_all_sequences(
            pipe, variables, davis_root=args.davis_root,
            results_root=args.results_root, output_json=args.output_json, cfg=cfg,
            device_parallel=False if args.parity_exact else None,
        )
        print(f"wrote {args.output_json}")
    else:
        run_osvos_experiments(
            pipe, variables, davis_root=args.davis_root,
            results_root=args.results_root, experiments_dir=args.experiments_dir,
        )


if __name__ == "__main__":
    main()
