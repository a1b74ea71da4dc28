#!/usr/bin/env python
"""End-to-end three-stage workflow validation on synthetic DAVIS data.

Reproduces the reference's complete experiment chain (SURVEY.md §3) without
real DAVIS data, at full 480x854 resolution, on whatever device JAX selects:

1. Mask R-CNN pretrain from scratch — trainable backbone+RPN
   (`code/maskrcnn/maskrcnn_src.py` workload);
2. SlowFast 3-3 VOS training seeded from that checkpoint with per-epoch
   official J&F evaluation on HELD-OUT sequences (`code/train.py` workload);
3. OSVOS online fine-tune of one held-out sequence from the stage-2 best
   weights (`code/osvos/train_osvos.py` workload).

Round-2 TPU record (v5e): stage-2 held-out J&F 0.65 -> 0.85 over 10 epochs;
stage-3 lift 0.859 -> 0.926 after one epoch of first-frame fine-tuning.

The seeding chain is load-bearing: training stage 2 from random init (frozen
random RPN) drives the loss down by predicting background while J&F stays
~0 — run with --skip-pretrain to demonstrate that negative control.

Use --small for a fast CPU smoke run.
"""
import argparse
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work-dir", default=None, help="default: a temp dir")
    p.add_argument("--small", action="store_true",
                   help="tiny resolution + configs for a CPU smoke run")
    p.add_argument("--pretrain-epochs", type=int, default=8)
    p.add_argument("--slowfast-epochs", type=int, default=10)
    p.add_argument("--osvos-epochs", type=int, default=2)
    p.add_argument("--skip-pretrain", action="store_true",
                   help="negative control: stage 2 from random init")
    args = p.parse_args()

    import jax

    from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
    from slowfast_vos_tpu.models.config import DetectionConfig
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
    from slowfast_vos_tpu.train.osvos import ExperimentConfig, train_osvos_sequence
    from slowfast_vos_tpu.train.pretrain import build_maskrcnn_pipeline, train_maskrcnn
    from slowfast_vos_tpu.train.trainer import train_unsupervised
    from slowfast_vos_tpu.utils.checkpoint import load_variables
    from train import _load_init

    work = args.work_dir or tempfile.mkdtemp(prefix="three_stage_")
    train_root = os.path.join(work, "davis_train")
    eval_root = os.path.join(work, "davis_eval")
    hw = (60, 100) if args.small else (480, 854)
    kw = dict(min_size=64, max_size=128, cfg=DetectionConfig(
        rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=32,
        rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
        box_batch_size_per_image=32, mask_train_rois=8,
        detections_per_img=5, max_gt=3,
    )) if args.small else {}
    make_synthetic_davis(train_root, num_sequences=6, frames=16, hw=hw,
                         num_objects=2, seed=1)
    make_synthetic_davis(eval_root, num_sequences=2, frames=12, hw=hw,
                         num_objects=2, subset="val", seed=2, year="2016")

    mrcnn_ckpt = os.path.join(work, "maskrcnn", "maskrcnn_model")
    if not args.skip_pretrain:
        pipe1, model1 = build_maskrcnn_pipeline(hw, **kw)
        v1 = init_variables(model1, jax.random.PRNGKey(63))
        _, hist1 = train_maskrcnn(
            pipe1, davis_root=train_root, output_dir=os.path.dirname(mrcnn_ckpt),
            epochs=args.pretrain_epochs, lr=1e-3, batch_size=2, variables=v1,
        )
        for h in hist1:
            print(f"[pretrain] epoch {h['epoch']}: loss={h['loss']:.4f}", flush=True)

    pipe, model = build_pipeline(3, 3, hw, **kw)
    variables = init_variables(model, jax.random.PRNGKey(63))
    if not args.skip_pretrain:
        variables = _load_init(mrcnn_ckpt, variables)

    sf_out = os.path.join(work, "slowfast")
    _, history = train_unsupervised(
        pipe, train_root=train_root, eval_root=eval_root, output_dir=sf_out,
        epochs=args.slowfast_epochs, lr=1e-3, seed=63, variables=variables,
    )
    for h in history:
        ev = h["eval"] or {}
        print(f"[slowfast] epoch {h['epoch']}: loss={h['loss']:.4f} "
              f"jf={ev.get('jf', float('nan')):.4f}", flush=True)

    best = load_variables(os.path.join(sf_out, "ckpt_best"))
    res = train_osvos_sequence(
        pipe, best, sequence_name="synth00", davis_root=eval_root,
        results_root=os.path.join(work, "osvos"),
        cfg=ExperimentConfig(freeze="BB_SF", lr=1e-4, scale=0.25,
                             epochs=args.osvos_epochs),
        items_per_epoch=40, eval_year="2016",
    )
    for epoch, r in sorted(res.items()):
        print(f"[osvos] epoch {epoch}: jf={r['jfmean']:.4f}", flush=True)
    print(f"artifacts under {work}")


if __name__ == "__main__":
    main()
