#!/usr/bin/env python
"""Unsupervised VOS training CLI — the `code/train.py` workload: train the
SlowFast segmentation model on DAVIS-2017 train, evaluate per epoch on
DAVIS-2016 val, keep best/last/resume checkpoints."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-root", required=True, help="DAVIS-2017 root")
    p.add_argument("--eval-root", default=None, help="DAVIS-2016 root (per-epoch eval)")
    p.add_argument("--output", default="output/unsupervised")
    p.add_argument("--slow", type=int, default=3)
    p.add_argument("--fast", type=int, default=3)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=63)
    p.add_argument("--original-hw", type=int, nargs=2, default=(480, 854))
    p.add_argument("--continue-training", action="store_true")
    p.add_argument("--init-checkpoint", default=None,
                   help="orbax variables checkpoint or reference .pth to start from")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard event files (reference train.py:82)")
    p.add_argument("--no-data-parallel", action="store_true",
                   help="force single-device steps even with multiple devices visible")
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from slowfast_vos_tpu.parallel.distributed import init_distributed_mode
    from slowfast_vos_tpu.train.trainer import train_unsupervised

    # Multi-host entry (env-guarded no-op single-process) — the reference's
    # init_distributed_mode (code/maskrcnn/utils.py:305-327).
    init_distributed_mode()

    pipe, model = build_pipeline(args.slow, args.fast, tuple(args.original_hw))
    variables = init_variables(model, jax.random.PRNGKey(args.seed))
    if args.init_checkpoint:
        variables = _load_init(args.init_checkpoint, variables)

    _state, history = train_unsupervised(
        pipe,
        train_root=args.train_root,
        eval_root=args.eval_root,
        output_dir=args.output,
        epochs=args.epochs,
        lr=args.lr,
        seed=args.seed,
        continue_training=args.continue_training,
        variables=variables,
        tensorboard=args.tensorboard,
        data_parallel=False if args.no_data_parallel else None,
    )
    for h in history:
        ev = h["eval"] or {}
        print(f"epoch {h['epoch']}: loss={h['loss']:.4f} jf={ev.get('jf', float('nan')):.4f}")


def _load_init(path: str, variables):
    if path.endswith(".pth"):
        import jax.numpy as jnp
        import jax

        from slowfast_vos_tpu.convert import convert_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        new_vars, report = convert_state_dict(sd, variables)
        print(f"converted {report['converted']} tensors from {path}; "
              f"{len(report['unused_source_keys'])} unused")
        return jax.tree.map(jnp.asarray, new_vars)
    # Orbax checkpoints: structure-agnostic restore (accepts both TrainState
    # and raw-variables layouts, ignores optimizer state). Missing subtrees
    # (e.g. slow_fast when seeding from a maskrcnn pretrain) keep their init.
    from slowfast_vos_tpu.utils.checkpoint import load_variables, migrate_params

    loaded = load_variables(path)
    loaded["params"] = migrate_params(loaded["params"], variables["params"])
    params = dict(variables["params"])
    for k in params:
        if k in loaded["params"]:
            params[k] = loaded["params"][k]
    stats = dict(variables.get("batch_stats", {}))
    stats.update(loaded.get("batch_stats", {}))
    return {"params": params, "batch_stats": stats}


if __name__ == "__main__":
    main()
