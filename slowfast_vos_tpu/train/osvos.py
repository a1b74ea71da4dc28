"""OSVOS-style semi-supervised workload: per-sequence online fine-tuning on
the first annotated frame, plus the sweep/aggregation drivers.

Rebuild of `code/osvos/{train_osvos,run_osvos_for_all_seq,
run_osvos_experiments,summarize_osvos_results}.py`:

* fine-tune from the best unsupervised weights on 200 augmented copies of
  frame 0 (`train_osvos.py:39-93`), grad-accum 2, SGD(cfg.lr, 0.9, 1e-4);
* freeze policies none / SF / BB_SF (`osvos_model.py:12-29`);
* per-epoch semi-supervised evaluation of the full sequence;
* sweep over freeze x scale x lr with JSON resume-by-skipping
  (`run_osvos_experiments.py:26-30`), full-val runs with incremental JSON
  (`run_osvos_for_all_seq.py:20-22`), per-epoch mean aggregation
  (`summarize_osvos_results.py:4-28`).
"""
from __future__ import annotations

import dataclasses
import json
import os
from statistics import mean

import jax

from slowfast_vos_tpu.data.davis import DavisIndex
from slowfast_vos_tpu.data.osvos_dataset import OsvosFirstFrameDataset
from slowfast_vos_tpu.eval.glue import davis_evaluation
from slowfast_vos_tpu.models.pipeline import Pipeline
from slowfast_vos_tpu.train.train_step import Trainer
from slowfast_vos_tpu.train.trainer import jax_batch
from slowfast_vos_tpu.utils.prefetch import prefetch


@dataclasses.dataclass
class ExperimentConfig:
    """Reference `osvos/experiment_config.py`."""

    freeze: str = "SF"  # 'none' | 'SF' | 'BB_SF'
    lr: float = 1e-3
    scale: float = 0.25
    epochs: int = 10

    def __str__(self):
        return f"Freeze: {self.freeze} Lr: {self.lr} Scale: {self.scale}"


def _freeze_flags(freeze: str) -> dict:
    return {
        "none": dict(train_backbone=True, train_slow_fast=True),
        "SF": dict(train_backbone=True, train_slow_fast=False),
        "BB_SF": dict(train_backbone=False, train_slow_fast=False),
    }[freeze]


def train_osvos_sequence(
    pipe: Pipeline,
    variables: dict,
    *,
    davis_root: str,
    sequence_name: str,
    results_root: str,
    cfg: ExperimentConfig | None = None,
    items_per_epoch: int = 200,
    seed: int = 63,
    eval_year: str = "2016",
) -> dict:
    """Fine-tune on one sequence; returns {epoch: {jfmean, jmean, fmean,
    eval_time}} with epoch -1 being the pre-training sanity eval, mirroring
    `train_osvos.py:69-80`."""
    cfg = cfg or ExperimentConfig()
    index = DavisIndex(davis_root, "val", year=eval_year, sequences=sequence_name)
    dataset = OsvosFirstFrameDataset(
        index.sequences[0],
        pipe.sf.fast,
        scale=cfg.scale,
        items_per_epoch=items_per_epoch,
        max_gt=pipe.cfg.max_gt,
        seed=seed,
    )
    trainer = Trainer(
        pipe, lr=cfg.lr, n_center=1, accumulate=2, **_freeze_flags(cfg.freeze)
    )
    state = trainer.init_state(variables)
    model_name = f"osvos_{pipe.sf.slow}-{pipe.sf.fast}_{sequence_name}"

    def evaluate():
        # shard_by_process=False: each process owns its own sequence here
        # (run_osvos_for_all_sequences does the process split); sharding the
        # single-sequence eval would desynchronize the collective barriers.
        jf, summary, per_obj, wall = davis_evaluation(
            pipe,
            trainer.eval_variables(state),
            davis_root=davis_root,
            results_root=results_root,
            model_name=model_name,
            sequences=sequence_name,
            year=eval_year,
            shard_by_process=False,
        )
        first = next(iter(per_obj.values()))
        return {
            "jfmean": jf,
            "jmean": first["J-Mean"],
            "fmean": first["F-Mean"],
            "eval_time": wall,
        }

    results = {-1: evaluate()}
    key = jax.random.PRNGKey(seed)
    for epoch in range(cfg.epochs):
        # Augment item i+1 (cv2 warps on the host) while the device steps on
        # item i; one producer thread keeps the dataset's shared RNG draw
        # order — and so every augmented item — identical to the serial loop.
        with prefetch((dataset[i] for i in range(len(dataset))), depth=2) as items:
            for batch in items:
                key, sub = jax.random.split(key)
                state, _metrics = trainer.step(state, sub, jax_batch(batch))
        results[epoch] = evaluate()
    return results


def train_osvos_sequences_lockstep(
    pipe: Pipeline,
    variables: dict,
    *,
    davis_root: str,
    sequence_names: list[str],
    results_root: str,
    cfg: ExperimentConfig | None = None,
    items_per_epoch: int = 200,
    seed: int = 63,
    eval_year: str = "2016",
    mesh=None,
) -> dict:
    """Device-parallel OSVOS: up to n_devices per-sequence fine-tunes advance
    in lockstep, one per local device (`parallel/lockstep.py`) — the
    reference runs these serially on one GPU (`run_osvos_for_all_seq.py`).

    Per-member semantics are the serial `train_osvos_sequence`: same seed-63
    per-sequence augmentation stream, same shared train key, same per-epoch
    semi-supervised eval + scoring. Member results are EXACTLY invariant to
    group composition (no cross-member collectives) and agree with a serial
    run to ~1e-2 relative J&F — the shard_map and serial lowerings of the
    bf16 train step fuse differently, the same ~1% grad drift bound as the
    DP trainer (tests/test_osvos_lockstep.py, tests/test_dp_drivers.py).
    A trailing group smaller than the mesh wrap-fills with duplicates of
    member 0, whose outputs are dropped.

    Parity-gated runs (the RUNBOOK 0.5-pt J&F gates) have two escape hatches
    from that bf16 lowering drift: (a) build the pipeline with
    `dtype=jnp.float32` — the drift collapses to f32 fusion noise and
    lockstep J&F matches serial to ~1e-6 relative
    (tests/test_osvos_lockstep.py::test_lockstep_f32_matches_serial_tightly);
    (b) skip lockstep entirely with `device_parallel=False` /
    `scripts/train_osvos.py --parity-exact`, which runs the reference's
    serial per-sequence loop (`code/osvos/train_osvos.py:72-80`) verbatim.

    Returns {sequence_name: {epoch: {jfmean, jmean, fmean, eval_time}}}.
    """
    import time

    import numpy as np

    from slowfast_vos_tpu.data.davis import load_sequence
    from slowfast_vos_tpu.eval.glue import _write_sequence_masks
    from slowfast_vos_tpu.eval.scorer import DavisScorer, summarize
    from slowfast_vos_tpu.parallel.dp_infer import DeviceParallelInference, infer_mesh
    from slowfast_vos_tpu.parallel.lockstep import (
        make_lockstep_train_step,
        stack_batches,
        stack_replicate,
    )

    cfg = cfg or ExperimentConfig()
    mesh = mesh or infer_mesh()
    assert mesh is not None, "lockstep OSVOS needs >1 local device; use train_osvos_sequence"
    n = mesh.devices.size
    real = list(sequence_names)
    assert 1 <= len(real) <= n, (len(real), n)
    names = real + [real[0]] * (n - len(real))

    infos = {
        name: DavisIndex(davis_root, "val", year=eval_year, sequences=name).sequences[0]
        for name in set(names)
    }
    datasets = [
        OsvosFirstFrameDataset(
            infos[name], pipe.sf.fast, scale=cfg.scale,
            items_per_epoch=items_per_epoch, max_gt=pipe.cfg.max_gt, seed=seed,
        )
        for name in names
    ]
    trainer = Trainer(
        pipe, lr=cfg.lr, n_center=1, accumulate=2, **_freeze_flags(cfg.freeze)
    )
    state = stack_replicate(trainer.init_state(variables), n, mesh)
    step = make_lockstep_train_step(trainer, mesh)
    dp_eval = DeviceParallelInference(pipe, mesh, stacked_variables=True)
    eval_images = [np.asarray(load_sequence(infos[nm], max_gt=pipe.cfg.max_gt)["images"]) for nm in real]

    def evaluate():
        t0 = time.time()
        eval_vars = {
            "params": {**state.params, **state.frozen},
            "batch_stats": state.batch_stats,
        }
        dets_per_member = dp_eval.infer_group(eval_vars, eval_images)
        out = {}
        for k, name in enumerate(real):
            model_name = f"osvos_{pipe.sf.slow}-{pipe.sf.fast}_{name}"
            out_dir = os.path.join(results_root, "semi-supervised", model_name)
            _write_sequence_masks(out_dir, name, dets_per_member[k], eval_year, 0.5, None)
            # Scoring protocol == davis_evaluation: always the unsupervised
            # evaluator, like the reference (`davis_evaluate.py:49`).
            metrics = DavisScorer(
                davis_root, task="unsupervised", gt_set="val",
                sequences=name, year=eval_year,
            ).evaluate(out_dir)
            summary = summarize(metrics)
            first_j = next(iter(metrics["J"]["M_per_object"].values()))
            first_f = next(iter(metrics["F"]["M_per_object"].values()))
            out[name] = {
                "jfmean": summary["J&F-Mean"],
                "jmean": first_j,
                "fmean": first_f,
                "eval_time": time.time() - t0,
            }
        return out

    results = {name: {} for name in real}
    for name, r in evaluate().items():
        results[name][-1] = r
    key = jax.random.PRNGKey(seed)
    for epoch in range(cfg.epochs):
        # Augment item i+1 for all members (host cv2 work) while the device
        # steps on item i; the single producer preserves each dataset's RNG
        # draw order, so every member's stream matches its serial run.
        with prefetch(
            (
                stack_batches([ds[i] for ds in datasets])
                for i in range(items_per_epoch)
            ),
            depth=2,
        ) as stacked_items:
            for batch in stacked_items:
                key, sub = jax.random.split(key)
                state, _metrics = step(state, sub, batch)
        for name, r in evaluate().items():
            results[name][epoch] = r
    return results


def run_osvos_for_all_sequences(
    pipe, variables, *, davis_root, results_root, output_json, cfg=None,
    shard_by_process: bool = True, device_parallel: bool | None = None, **kw
):
    """Full-val OSVOS run with incremental JSON dump after each sequence.

    The 20 per-sequence fine-tunes are independent, so multi-process
    launches split them round-robin by process (the ideal slice workload:
    one chip per sequence). Each process dumps its shard incrementally to
    `<output_json>.rank<r>` (crash loses at most one sequence, like the
    reference `run_osvos_for_all_seq.py:20-22`); at the end the shards are
    all-gathered and the master writes the merged `output_json`. Every
    process returns the full merged results.

    Within one process, `device_parallel` (default: auto-on for >1 local
    TPU device, like eval) additionally runs this process's sequences in
    lockstep groups of n_local_devices — one independent fine-tune per chip
    (`train_osvos_sequences_lockstep`); a crash then loses at most one
    GROUP of sequences."""
    import jax as _jax

    from slowfast_vos_tpu.parallel.distributed import (
        get_rank, get_world_size, save_on_master,
    )
    from slowfast_vos_tpu.parallel.dp_infer import infer_mesh

    index = DavisIndex(davis_root, "val", year="2016")
    infos = list(index)
    world = get_world_size() if shard_by_process else 1
    my_infos = infos[get_rank()::world] if world > 1 else infos
    my_json = f"{output_json}.rank{get_rank()}" if world > 1 else output_json

    if device_parallel is None:
        device_parallel = _jax.default_backend() in ("tpu", "axon")
    mesh = infer_mesh() if device_parallel else None

    def dump(results):
        with open(my_json, "w") as f:
            json.dump({k: {str(e): v for e, v in r.items()} for k, r in results.items()}, f)

    # The per-sequence eval inside train_osvos_sequence must NOT shard
    # again: this driver already owns the process split.
    all_results = {}
    if mesh is not None:
        n = mesh.devices.size
        for s in range(0, len(my_infos), n):
            group = [i.name for i in my_infos[s : s + n]]
            all_results.update(train_osvos_sequences_lockstep(
                pipe, variables,
                davis_root=davis_root, sequence_names=group,
                results_root=results_root, cfg=cfg, mesh=mesh, **kw,
            ))
            dump(all_results)
    else:
        for info in my_infos:
            all_results[info.name] = train_osvos_sequence(
                pipe, variables,
                davis_root=davis_root, sequence_name=info.name,
                results_root=results_root, cfg=cfg, **kw,
            )
            dump(all_results)

    if world > 1:
        all_results = _merge_osvos_results(all_results, [i.name for i in infos])
        save_on_master(
            lambda: json.dump(
                {k: {str(e): v for e, v in r.items()} for k, r in all_results.items()},
                open(output_json, "w"),
            )
        )
    return all_results


_OSVOS_KEYS = ("jfmean", "jmean", "fmean", "eval_time")


def _merge_osvos_results(local: dict, all_names: list[str]) -> dict:
    """All-gather per-sequence OSVOS results (fixed-shape float table over
    epochs x stats; epoch -1 is row 0) and rebuild the full dict in global
    sequence order — same collective discipline as
    `eval/glue.py:merge_scorer_metrics`."""
    import numpy as np
    from jax.experimental import multihost_utils

    from slowfast_vos_tpu.parallel.distributed import host_barrier

    # Processes arrive here skewed by up to one whole per-sequence fine-tune;
    # sync on the coordination service before the first Gloo collective.
    host_barrier("merge_osvos_results")

    epochs = sorted(next(iter(local.values())).keys()) if local else []
    n_ep = multihost_utils.process_allgather(np.asarray(len(epochs), np.int32))
    n_ep = int(np.max(np.asarray(n_ep)))
    name_idx = {n: i for i, n in enumerate(all_names)}
    cap = len(all_names)
    table = np.full((cap, n_ep, len(_OSVOS_KEYS)), np.nan)
    present = np.zeros((cap,), bool)
    for name, res in local.items():
        i = name_idx[name]
        present[i] = True
        for e, epoch in enumerate(sorted(res.keys())):
            table[i, e] = [res[epoch][k] for k in _OSVOS_KEYS]
    # int32-view transport keeps the f64 statistics bit-exact (allgather
    # would otherwise downcast to f32 under jax's default x64-off config).
    tables = (
        np.asarray(multihost_utils.process_allgather(table.view(np.int32)))
        .copy().view(np.float64)
    )
    presents = np.asarray(multihost_utils.process_allgather(present))
    merged = {}
    for i, name in enumerate(all_names):
        owners = np.nonzero(presents[:, i])[0]
        if owners.size == 0:
            continue
        t = tables[owners[0], i]
        merged[name] = {
            e - 1: dict(zip(_OSVOS_KEYS, (float(v) for v in t[e])))
            for e in range(n_ep)
            if np.isfinite(t[e]).all()
        }
    return merged


def run_osvos_experiments(
    pipe, variables, *, davis_root, results_root, experiments_dir,
    freeze_options=("none", "SF", "BB_SF"), scales=(0.25, 0.4),
    lrs=(1e-3, 5e-4, 1e-4, 5e-3), sequences=("breakdance", "bmx-trees"),
    epochs=5, **kw,
):
    """Grid sweep with resume-by-skipping completed JSON configs."""
    os.makedirs(experiments_dir, exist_ok=True)
    for freeze in freeze_options:
        for scale in scales:
            for lr in lrs:
                cfg = ExperimentConfig(freeze=freeze, lr=lr, scale=scale, epochs=epochs)
                name = (
                    f"osvos_sp_{pipe.sf.slow}fp_{pipe.sf.fast}"
                    f"_freeze_{freeze}_scale_{scale}_lr_{lr}"
                )
                out_json = os.path.join(experiments_dir, f"{name}.json")
                if os.path.exists(out_json):
                    continue
                results = {}
                for seq in sequences:
                    results[seq] = train_osvos_sequence(
                        pipe, variables,
                        davis_root=davis_root, sequence_name=seq,
                        results_root=results_root, cfg=cfg, **kw,
                    )
                    with open(out_json, "w") as f:
                        json.dump({k: {str(e): v for e, v in r.items()} for k, r in results.items()}, f)


def summarize_osvos_results(json_path: str, epochs: int = 10):
    """Per-epoch mean over sequences (`summarize_osvos_results.py:4-28`)."""
    with open(json_path) as f:
        all_results = json.load(f)
    rows = []
    for epoch in range(epochs):
        key = str(epoch)
        vals = [r[key] for r in all_results.values() if key in r]
        if not vals:
            break
        rows.append(
            {
                "epoch": epoch,
                "jf": mean(v["jfmean"] for v in vals),
                "j": mean(v["jmean"] for v in vals),
                "f": mean(v["fmean"] for v in vals),
                "time": mean(v["eval_time"] for v in vals),
            }
        )
    return rows
