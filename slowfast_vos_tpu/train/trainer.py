"""Unsupervised VOS training driver.

Rebuild of the reference `code/train.py:49-121`: train on DAVIS-2017 train
sequences, SGD(1e-3, momentum 0.9, wd 1e-4) with effective 2-frame steps,
per-epoch DAVIS-2016 val evaluation, best/last/resumable checkpoints, scalar
metrics logging, seed-63-style determinism via explicit jax.random threading.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from slowfast_vos_tpu.data.davis import DavisIndex, load_sequence
from slowfast_vos_tpu.data.windows import train_windows
from slowfast_vos_tpu.eval.glue import davis_evaluation
from slowfast_vos_tpu.models.pipeline import Pipeline, init_variables
from slowfast_vos_tpu.parallel.distributed import local_batch_slice, save_on_master
from slowfast_vos_tpu.parallel.mesh import make_mesh
from slowfast_vos_tpu.parallel.sharded import (
    make_sharded_train_step,
    replicate_state,
    shard_windows,
    stack_windows,
)
from slowfast_vos_tpu.train.train_step import Trainer, TrainState
from slowfast_vos_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from slowfast_vos_tpu.utils.metrics import MetricsLogger
from slowfast_vos_tpu.utils.prefetch import prefetch


def jax_batch(batch: dict):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()}


def train_unsupervised(
    pipe: Pipeline,
    *,
    train_root: str,
    eval_root: str | None = None,
    output_dir: str = "output",
    epochs: int = 20,
    lr: float = 1e-3,
    seed: int = 63,
    train_year: str = "2017",
    eval_year: str = "2016",
    continue_training: bool = False,
    eval_every_epoch: bool = True,
    max_windows_per_epoch: int | None = None,
    variables: dict | None = None,
    tensorboard: bool = False,
    data_parallel: bool | None = None,
):
    """Returns (final TrainState, history list of per-epoch dicts).
    `tensorboard=True` mirrors every scalar to TensorBoard event files like
    the reference's SummaryWriter (`code/train.py:82,103,109-111`).

    `data_parallel` (default: auto — on when more than one device is
    visible) drives the shard_map DP step (`parallel/sharded.py`): each
    optimizer step consumes one window PER DEVICE, gradients/metrics/BN
    stats are pmean-synced — the production analogue of the reference's
    DDP wrap (`code/maskrcnn/train.py:102`). A trailing group smaller than
    the device count is wrap-filled with windows from the start of the
    epoch, torch DistributedSampler's padding convention
    (`train.py:73-74`). Multi-process launches feed each process its
    `local_batch_slice` of every group."""
    os.makedirs(output_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(output_dir, "logs"), "train", tensorboard=tensorboard)
    trainer = Trainer(pipe, lr=lr)

    n_dev = len(jax.devices())
    if data_parallel is None:
        data_parallel = n_dev > 1
    if data_parallel:
        mesh = make_mesh(n_dev)
        dp_step = make_sharded_train_step(trainer, mesh)

    if variables is None:
        variables = init_variables(pipe.model, jax.random.PRNGKey(seed))
    state = trainer.init_state(variables)
    start_epoch = 0

    last_path = os.path.join(output_dir, "ckpt_last")
    best_path = os.path.join(output_dir, "ckpt_best")
    if continue_training and os.path.exists(last_path):
        state, meta = restore_checkpoint(last_path, target=state)
        start_epoch = (meta or {}).get("epoch", 0) + 1
    if data_parallel:
        state = replicate_state(state, mesh)

    index = DavisIndex(train_root, "train", year=train_year)
    key = jax.random.PRNGKey(seed)
    model_name = f"slowfast_{pipe.sf.slow}-{pipe.sf.fast}"

    def run_eval():
        if not eval_every_epoch or eval_root is None:
            return None
        jf, summary, _, wall = davis_evaluation(
            pipe,
            trainer.eval_variables(state),
            davis_root=eval_root,
            results_root=os.path.join(output_dir, "results"),
            model_name=model_name,
            year=eval_year,
        )
        return {"jf": jf, "wall": wall, **summary}

    history = []
    best_jf = -1.0
    # Sanity eval before training, as the reference does (train.py:95-96).
    pre = run_eval()
    if pre is not None:
        logger.scalar("eval/jf", pre["jf"], step=-1)

    def epoch_windows():
        count = 0
        for info in index:
            seq = load_sequence(info, max_gt=pipe.cfg.max_gt)
            for batch in train_windows(seq, fast=pipe.sf.fast, n_center=trainer.n_center):
                yield batch
                count += 1
                if max_windows_per_epoch and count >= max_windows_per_epoch:
                    return

    global_step = 0
    for epoch in range(start_epoch, epochs):
        epoch_loss = 0.0
        # Decode/pack the next windows on a background thread while the
        # device steps (utils/prefetch.py) — the DataLoader-worker overlap
        # the reference's own drivers forfeit (`code/train.py:66-67`).
        # Order (and so the training trajectory) is unchanged.
        if not data_parallel:
            with prefetch(epoch_windows(), depth=2) as batches:
                for batch in batches:
                    key, sub = jax.random.split(key)
                    state, metrics = trainer.step(state, sub, jax_batch(batch))
                    loss = float(metrics["loss"])
                    if not np.isfinite(loss):
                        # Vendored-engine behavior: abort rather than training
                        # on (engine.py:48-51).
                        raise FloatingPointError(f"Loss is {loss}, stopping training")
                    epoch_loss += loss
                    logger.scalar("train/batch_loss", loss, global_step)
                    global_step += 1
        else:
            group: list = []
            fill: list = []  # earliest windows of the epoch, for wrap-fill
            pending = True
            with prefetch(epoch_windows(), depth=n_dev + 1) as gen:
                while pending:
                    for batch in gen:
                        group.append(batch)
                        if len(fill) < n_dev - 1:
                            fill.append(batch)
                        if len(group) == n_dev:
                            break
                    else:
                        pending = False
                        if not group:
                            break
                    n_real = len(group)
                    if n_real < n_dev:
                        # Trailing partial group: wrap-fill with the epoch's
                        # first windows (DistributedSampler's even-padding).
                        for i in range(n_dev - n_real):
                            group.append(fill[i % len(fill)])
                    local = group[local_batch_slice(n_dev)] if jax.process_count() > 1 else group
                    sharded = shard_windows(stack_windows(local), mesh)
                    key, sub = jax.random.split(key)
                    state, metrics = dp_step(state, sub, sharded)
                    loss = float(metrics["loss"])  # pmean over the group
                    if not np.isfinite(loss):
                        raise FloatingPointError(f"Loss is {loss}, stopping training")
                    epoch_loss += loss * n_real  # sum-over-windows, like serial
                    logger.scalar("train/batch_loss", loss, global_step)
                    global_step += 1
                    group = []

        logger.scalar("train/epoch_loss", epoch_loss, epoch)
        ev = run_eval()
        entry = {"epoch": epoch, "loss": epoch_loss, "eval": ev}
        history.append(entry)
        save_on_master(save_checkpoint, last_path, state, meta={"epoch": epoch})
        if ev is not None:
            logger.scalars({"jf": ev["jf"], "time": ev["wall"]}, epoch, prefix="eval/")
            if ev["jf"] > best_jf:
                best_jf = ev["jf"]
                save_on_master(
                    save_checkpoint, best_path, state, meta={"epoch": epoch, "jf": ev["jf"]}
                )
        else:
            save_on_master(save_checkpoint, best_path, state, meta={"epoch": epoch})
    logger.close()
    return state, history
