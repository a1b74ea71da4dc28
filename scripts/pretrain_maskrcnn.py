#!/usr/bin/env python
"""Mask R-CNN DAVIS fine-tune CLI — produces the `maskrcnn_model` checkpoint
the SlowFast stage starts from; also dumps RPN proposals (the
`code/maskrcnn/maskrcnn_src.py` workload; --predict-boxes = its
`train=False` mode)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--davis-root", required=True)
    p.add_argument("--output", default="output/maskrcnn")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--year", default="2017")
    p.add_argument("--init-checkpoint", default=None, help=".pth (e.g. COCO weights) or orbax")
    p.add_argument("--predict-boxes", action="store_true",
                   help="skip training; dump RPN proposals for --subset")
    p.add_argument("--subset", default="train")
    p.add_argument("--original-hw", type=int, nargs=2, default=(480, 854))
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.models.pipeline import init_variables
    from slowfast_vos_tpu.parallel.distributed import init_distributed_mode
    from slowfast_vos_tpu.train.pretrain import (
        build_maskrcnn_pipeline,
        extract_rpn_proposals,
        train_maskrcnn,
    )
    from scripts.train import _load_init

    # Multi-host entry (env-guarded no-op single-process) — the reference's
    # init_distributed_mode (code/maskrcnn/utils.py:305-327).
    init_distributed_mode()

    pipe, model = build_maskrcnn_pipeline(tuple(args.original_hw))
    variables = init_variables(model, jax.random.PRNGKey(63))
    if args.init_checkpoint:
        variables = _load_init(args.init_checkpoint, variables)

    if args.predict_boxes:
        out = extract_rpn_proposals(
            pipe, variables, davis_root=args.davis_root,
            output_path=f"{args.output}/predicted_proposals_{args.subset}_{args.year}.npz",
            subset=args.subset, year=args.year,
        )
        print(f"wrote {out}")
        return

    _state, history = train_maskrcnn(
        pipe, davis_root=args.davis_root, output_dir=args.output,
        epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        year=args.year, variables=variables,
    )
    for h in history:
        print(f"epoch {h['epoch']}: loss={h['loss']:.4f}")


if __name__ == "__main__":
    main()
