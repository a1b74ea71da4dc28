"""Mask R-CNN DAVIS fine-tune path (no SlowFast) + RPN proposal extraction.

Rebuild of the reference driver `code/maskrcnn/maskrcnn_src.py:214-285` and
the relevant vendored-engine behaviors (`code/maskrcnn/engine.py`):

* trains the FULL detector (backbone+RPN+heads) on frame-level DAVIS data,
  SGD(1e-3, momentum 0.9, wd 5e-4... the reference passes wd=0.0005), StepLR
  step_size=3 gamma=0.1 for 15 epochs (`maskrcnn_src.py:253-259`);
* linear LR warmup over the first min(1000, steps-1) iterations of epoch 0
  (`engine.py:33-38`);
* abort on non-finite loss (`engine.py:48-51`);
* `predict_boxes` mode: dump per-frame RPN proposals + scores to an .npz,
  the equivalent of the monkey-patched `rpn_forward` dump
  (`engine.py:166-236`, `predicted_proposals_{split}_{year}.pt`).
"""
from __future__ import annotations

import os

import jax
import numpy as np

from slowfast_vos_tpu.data.davis import DavisIndex, load_sequence
from slowfast_vos_tpu.data.frames import DavisFrameDataset, frame_batches
from slowfast_vos_tpu.utils.prefetch import prefetch
from slowfast_vos_tpu.models.pipeline import Pipeline, build_pipeline, init_variables
from slowfast_vos_tpu.train.train_step import Trainer
from slowfast_vos_tpu.train.trainer import jax_batch
from slowfast_vos_tpu.utils.checkpoint import save_checkpoint
from slowfast_vos_tpu.utils.metrics import MetricsLogger


def warmup_step_lr(base_lr: float, steps_per_epoch: int, *, warmup_iters: int,
                   step_size_epochs: int = 3, gamma: float = 0.1):
    """Linear warmup (epoch 0) then StepLR every `step_size_epochs` epochs."""
    warmup_iters = max(warmup_iters, 1)

    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.minimum(step / warmup_iters, 1.0)
        factor = 1.0 / 1000 + (1 - 1.0 / 1000) * warm  # engine.py warmup_factor
        epoch = step // steps_per_epoch
        decay = gamma ** (epoch // step_size_epochs)
        return base_lr * jnp.where(step < warmup_iters, factor, 1.0) * decay

    return schedule


def build_maskrcnn_pipeline(original_hw=(480, 854), **kw):
    """Single-frame Mask R-CNN: fast=1 (no temporal halo), SlowFast bypassed."""
    return build_pipeline(slow=1, fast=1, original_hw=original_hw, use_slow_fast=False, **kw)


def train_maskrcnn(
    pipe: Pipeline,
    *,
    davis_root: str,
    output_dir: str,
    epochs: int = 15,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    batch_size: int = 2,
    year: str = "2017",
    seed: int = 63,
    max_steps_per_epoch: int | None = None,
    variables: dict | None = None,
):
    """Returns (TrainState, history). Checkpoints `maskrcnn_model` each epoch
    (the artifact the SlowFast stage consumes, reference `model.py:173`)."""
    os.makedirs(output_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(output_dir, "logs"), "maskrcnn")
    dataset = DavisFrameDataset(davis_root, "train", year=year, max_gt=pipe.cfg.max_gt)
    steps_per_epoch = max_steps_per_epoch or max(len(dataset) // batch_size, 1)
    schedule = warmup_step_lr(
        lr, steps_per_epoch, warmup_iters=min(1000, steps_per_epoch - 1) or 1
    )
    def make_trainer(p):
        # trainable_backbone_layers=3 = torchvision's pretrained-detector
        # default: conv1/bn1/layer1 frozen (`maskrcnn_src.py:190`, optimizer
        # filtered on requires_grad at :253-255).
        return Trainer(
            p, lr=schedule, weight_decay=weight_decay,
            n_center=batch_size, train_backbone=True,
            trainable_backbone_layers=3,
        )

    trainer = make_trainer(pipe)
    # Mixed-resolution data (aspect-grouped by `frame_batches`) trains through
    # one Pipeline per padded canvas — same model/params, different static
    # geometry — the reference's GroupedBatchSampler + batch_images pairing
    # (`group_by_aspect_ratio.py:23-196`). Uniform data (DAVIS) only ever
    # touches the default entry.
    trainers = {tuple(pipe.transform.original_hw): trainer}

    def trainer_for(images_hw):
        t = trainers.get(images_hw)
        if t is None:
            from slowfast_vos_tpu.models.transform import ImageTransform

            tf = ImageTransform(
                images_hw,
                min_size=pipe.transform.min_size,
                max_size=pipe.transform.max_size,
                divisor=pipe.transform.divisor,
            )
            t = make_trainer(
                Pipeline(
                    pipe.model, tf,
                    backbone_batch=pipe.backbone_batch, chunk=pipe.chunk,
                )
            )
            trainers[images_hw] = t
        return t

    if variables is None:
        variables = init_variables(pipe.model, jax.random.PRNGKey(seed))
    state = trainer.init_state(variables)

    key = jax.random.PRNGKey(seed)
    history = []
    step = 0
    for epoch in range(epochs):
        epoch_loss = 0.0
        n = 0
        # Background decode/pack of the next batches (utils/prefetch.py) —
        # the num_workers>0 overlap of the reference's vendored script
        # (`code/maskrcnn/train.py:73-77`); batch order is unchanged.
        # train_flip: the reference's RandomHorizontalFlip(0.5) train
        # transform (`maskrcnn_src.py:207-212`).
        with prefetch(
            frame_batches(dataset, batch_size, seed=seed + epoch, train_flip=True), depth=2
        ) as bs:
            for batch in bs:
                key, sub = jax.random.split(key)
                tr = trainer_for(tuple(batch["images"].shape[1:3]))
                state, metrics = tr.step(state, sub, jax_batch(batch))
                loss = float(metrics["loss"])
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"Loss is {loss}, stopping training (non-finite loss abort)"
                    )
                epoch_loss += loss
                logger.scalar("pretrain/loss", loss, step)
                step += 1
                n += 1
                if max_steps_per_epoch and n >= max_steps_per_epoch:
                    break
        history.append({"epoch": epoch, "loss": epoch_loss / max(n, 1)})
        save_checkpoint(os.path.join(output_dir, "maskrcnn_model"), state, meta={"epoch": epoch})
    logger.close()
    return state, history


def extract_rpn_proposals(
    pipe: Pipeline,
    variables,
    *,
    davis_root: str,
    output_path: str,
    subset: str = "train",
    year: str = "2017",
):
    """Dump per-frame RPN proposals for every sequence to one .npz — the
    `predict_boxes` workload (`engine.py:195-236`)."""
    index = DavisIndex(davis_root, subset, year=year)
    out = {}
    with prefetch(
        ((info, load_sequence(info, max_gt=pipe.cfg.max_gt)) for info in index), depth=1
    ) as decoded:
        for info, seq in decoded:
            _feats, proposals, pvalid = pipe.compute_sequence_features(variables, seq["images"])
            out[f"{info.name}/proposals"] = np.asarray(proposals)
            out[f"{info.name}/valid"] = np.asarray(pvalid)
    np.savez_compressed(output_path, **out)
    return output_path
