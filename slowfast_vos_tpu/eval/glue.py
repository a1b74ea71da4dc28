"""Evaluation glue: run the model over DAVIS sequences, write the PNG results
layout, invoke the scorer — the equivalent of the reference's
`davis_evaluation` (`code/helpers/davis_evaluate.py:20-79`) and
`extract_for_davis_eval.py`.

The on-disk contract is preserved exactly: per-frame UNION of all detection
masks thresholded at 0.5 (`davis_evaluate.py:36-44`), written as
`<results_root>/<task>/<model_name>/<seq>/00000.png...`, scoreable by both our
scorer and the reference's vendored one.
"""
from __future__ import annotations

import os
import time

import numpy as np
from PIL import Image

from slowfast_vos_tpu.data.davis import DavisIndex, load_sequence, save_palette_mask
from slowfast_vos_tpu.eval.scorer import DavisScorer, summarize
from slowfast_vos_tpu.parallel.distributed import get_rank, get_world_size, host_barrier
from slowfast_vos_tpu.utils.prefetch import prefetch


def union_mask(det: dict, threshold: float = 0.5) -> np.ndarray:
    """Union of valid detection masks >= threshold -> bool [H, W].

    The fast path uses the on-device union the pipeline computes (threshold
    0.5); per-instance masks are only consulted for a non-default threshold.
    """
    if threshold == 0.5 and "union_mask" in det:
        return det["union_mask"].astype(bool)
    masks = det["masks"] >= threshold
    masks = masks & det["valid"][:, None, None]
    return masks.any(axis=0)


def _write_sequence_masks(out_dir, name, dets, year, threshold, progress):
    seq_dir = os.path.join(out_dir, name)
    os.makedirs(seq_dir, exist_ok=True)
    for i, det in enumerate(dets):
        mask = union_mask(det, threshold)
        path = os.path.join(seq_dir, f"{i:05d}.png")
        if year == "2016":
            Image.fromarray((mask * 255).astype(np.uint8)).save(path)
        else:
            save_palette_mask(mask.astype(np.uint8), path)
    if progress is not None:
        progress(name)


def extract_masks(
    pipe,
    variables,
    davis_root: str,
    out_dir: str,
    *,
    sequences="all",
    subset: str = "val",
    year: str = "2016",
    threshold: float = 0.5,
    progress=None,
    shard_by_process: bool = True,
    device_parallel: bool | None = None,
):
    """Run inference and write per-frame union masks as PNGs.

    Year 2016 writes 0/255 binary PNGs — byte-compatible with the
    reference's on-disk contract (`davis_evaluate.py:36-44` saves
    union*255, the scorer divides by 255 only for 2016,
    `results.py:30-35`). Year 2017 writes the union as palette id 1: the
    2017 reader treats pixel values as object ids (`max()` = object
    count), so a 255-valued mask would read as 255 proposals there —
    a path the reference never exercised (it only ever scored 2016).

    Multi-process launches split the sequence list round-robin by process
    (`shard_by_process=True`, the analogue of the reference's
    DistributedSampler over images, `code/maskrcnn/train.py:73-74`); each
    process writes its shard of the shared tree, then all processes
    barrier so the tree is complete before anyone scores it.

    Within one process, `device_parallel` additionally maps this process's
    sequences onto the LOCAL devices — groups of N sequences stream
    superchunks in lockstep as one shard_mapped SPMD program
    (`parallel/dp_infer.py`), bit-identical to the serial loop. Default
    (None): auto-on when >1 local device is visible on a TPU backend;
    virtual CPU "devices" share the same host cores, so the serial path
    stays the CPU default (tests opt in with device_parallel=True)."""
    index = DavisIndex(davis_root, subset, year=year, sequences=sequences)
    infos = list(index)
    sharded = shard_by_process and get_world_size() > 1
    if sharded:
        infos = infos[get_rank() :: get_world_size()]

    import jax

    from slowfast_vos_tpu.parallel.dp_infer import DeviceParallelInference, infer_mesh

    if device_parallel is None:
        device_parallel = jax.default_backend() in ("tpu", "axon")
    # infer_mesh() is None with a single local device: graceful serial fallback.
    mesh = infer_mesh() if device_parallel else None

    if mesh is not None:
        dp = DeviceParallelInference(pipe, mesh)
        n = dp.n
        # Decode one group ahead: the producer decodes group g+1's JPEGs
        # while group g runs inference.
        groups = (infos[s : s + n] for s in range(0, len(infos), n))
        with prefetch(
            (
                [(info, load_sequence(info, max_gt=pipe.cfg.max_gt)) for info in grp]
                for grp in groups
            ),
            depth=1,
        ) as decoded_groups:
            for grp in decoded_groups:
                results = dp.infer_group(variables, [seq["images"] for _, seq in grp])
                for (info, _), dets in zip(grp, results):
                    _write_sequence_masks(out_dir, info.name, dets, year, threshold, progress)
    else:
        # Serial device path. Decode the next sequence's JPEGs on a background
        # thread while the current one runs inference (utils/prefetch.py);
        # depth 1 bounds host memory to ~3 decoded sequences (consumer-held +
        # queued + in flight inside the producer).
        with prefetch(
            ((info, load_sequence(info, max_gt=pipe.cfg.max_gt)) for info in infos), depth=1
        ) as decoded:
            for info, seq in decoded:
                dets = pipe.infer_sequence(variables, seq["images"])  # uint8 straight in
                _write_sequence_masks(out_dir, info.name, dets, year, threshold, progress)
    if sharded:
        # Coordination-service barrier (not a Gloo device collective, whose
        # 30 s context-init rendezvous real per-sequence skew exceeds).
        host_barrier("extract_masks_done")


MAX_OBJECTS_PER_SEQ = 20  # scorer proposal cap (`evaluation.py:46`)


def merge_scorer_metrics(local: dict, global_sequences: list[str]) -> dict:
    """All-gather per-(sequence, object) J/F statistics scored by each
    process over its sequence shard, and rebuild the full metrics dict in
    global sequence order.

    TPU-native analogue of the reference's pickled `all_gather` COCO-eval
    merge (`code/maskrcnn/utils.py:79-119`): the payload is a fixed-shape
    [cap, 8] row table ([seq_idx, obj_id, JM, JR, JD, FM, FR, FD], padded
    with seq_idx = -1) that `process_allgather` moves as one collective.
    Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return local

    from jax.experimental import multihost_utils

    # Sync before the Gloo rendezvous: per-shard scoring time differs across
    # processes and the first collective's context init times out at 30 s.
    host_barrier("merge_scorer_metrics")

    seq_idx = {s: i for i, s in enumerate(global_sequences)}
    cap = max(1, len(global_sequences)) * MAX_OBJECTS_PER_SEQ
    payload = np.full((cap, 8), -1.0)
    names = list(local["J"]["M_per_object"])
    for row, name in enumerate(names):
        seq, obj = name.rsplit("_", 1)
        payload[row] = [
            seq_idx[seq],
            float(obj),
            local["J"]["M"][row],
            local["J"]["R"][row],
            local["J"]["D"][row],
            local["F"]["M"][row],
            local["F"]["R"][row],
            local["F"]["D"][row],
        ]
    # Bit-exact f64 transport: allgather moves arrays as f32 under jax's
    # default x64-off config, so ship the raw int32 view and reinterpret.
    gathered = np.asarray(
        multihost_utils.process_allgather(payload.view(np.int32))
    ).reshape(-1, 16).copy().view(np.float64)
    rows = gathered[gathered[:, 0] >= 0]
    order = np.lexsort((rows[:, 1], rows[:, 0]))
    rows = rows[order]
    out = {
        "J": {"M": [], "R": [], "D": [], "M_per_object": {}},
        "F": {"M": [], "R": [], "D": [], "M_per_object": {}},
    }
    for r in rows:
        name = f"{global_sequences[int(r[0])]}_{int(r[1])}"
        for metric, vals in (("J", r[2:5]), ("F", r[5:8])):
            out[metric]["M"].append(float(vals[0]))
            out[metric]["R"].append(float(vals[1]))
            out[metric]["D"].append(float(vals[2]))
            out[metric]["M_per_object"][name] = float(vals[0])
    return out


def davis_evaluation(
    pipe,
    variables,
    *,
    davis_root: str,
    results_root: str,
    model_name: str,
    sequences=None,
    subset: str = "val",
    year: str = "2016",
    shard_by_process: bool = True,
):
    """Inference + official scoring. `sequences=None` evaluates the full set;
    naming sequences (the OSVOS flow) writes under the 'semi-supervised'
    results path, mirroring `davis_evaluate.py:27`.

    The task name ONLY picks the results directory: scoring ALWAYS uses the
    unsupervised evaluator (all frames, Hungarian matching), exactly like the
    reference, whose `davis_evaluate.py:49` hardcodes task='unsupervised' for
    `DAVISEvaluation` regardless of the output path. (The semi-supervised
    protocol would exclude the first/last frames and shift OSVOS numbers.)

    Returns (jf_mean, global_summary dict, per_object dict, wall_time_s).
    """
    t0 = time.time()
    task = "unsupervised" if sequences is None else "semi-supervised"
    seqs = "all" if sequences is None else sequences
    out_dir = os.path.join(results_root, task, model_name)
    extract_masks(
        pipe, variables, davis_root, out_dir, sequences=seqs, subset=subset,
        year=year, shard_by_process=shard_by_process,
    )
    scorer = DavisScorer(
        davis_root, task="unsupervised", gt_set=subset, sequences=seqs, year=year
    )
    if shard_by_process and get_world_size() > 1:
        # Score only this process's sequence shard, then merge the per-object
        # statistics across processes — every process returns the full table.
        all_seqs = list(scorer.sequences)
        scorer.sequences = all_seqs[get_rank() :: get_world_size()]
        metrics = merge_scorer_metrics(scorer.evaluate(out_dir), all_seqs)
    else:
        metrics = scorer.evaluate(out_dir)
    summary = summarize(metrics)
    per_object = {
        name: {"J-Mean": metrics["J"]["M_per_object"][name], "F-Mean": metrics["F"]["M_per_object"][name]}
        for name in metrics["J"]["M_per_object"]
    }
    return summary["J&F-Mean"], summary, per_object, time.time() - t0
