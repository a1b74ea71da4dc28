"""Two-process sharded DAVIS evaluation (VERDICT r2 item 1b).

Both ranks build the same tiny deterministic pipeline; the sequence list is
split round-robin by process inside `extract_masks`/`davis_evaluation`. Rank
0 additionally runs the serial path and asserts:

* the sharded PNG results tree is BYTE-IDENTICAL to the serial one;
* the `merge_scorer_metrics`-combined J/F table equals the serial scorer's.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, filecmp, json
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from slowfast_vos_tpu.parallel.distributed import init_distributed_mode, get_rank

assert init_distributed_mode(verbose=False)
rank = get_rank()
work = os.environ["WORK_DIR"]

# Identical synthetic DAVIS-2016 val tree on both ranks (same seed).
from slowfast_vos_tpu.data.synthetic import make_synthetic_davis

root = os.path.join(work, f"davis_{rank}")  # per-rank copy, same content
make_synthetic_davis(root, num_sequences=3, frames=4, hw=(60, 100),
                     num_objects=1, year="2016", subset="val", seed=11)

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

cfg = DetectionConfig(
    rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=32,
    rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
    box_batch_size_per_image=32, mask_train_rois=8,
    detections_per_img=5, max_gt=3,
)
pipe, model = build_pipeline(
    slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
    cfg=cfg, backbone_batch=4, chunk=4,
)
variables = init_variables(model, jax.random.PRNGKey(0))  # deterministic

from slowfast_vos_tpu.eval.glue import davis_evaluation, extract_masks

shared_out = os.path.join(work, "sharded_tree")  # SHARED dir: both ranks write
jf, summary, per_obj, _ = davis_evaluation(
    pipe, variables,
    davis_root=root,
    results_root=os.path.join(work, "sharded_results"),
    model_name="m",
    year="2016",
)
extract_masks(pipe, variables, root, shared_out, year="2016")

if rank == 0:
    serial_out = os.path.join(work, "serial_tree")
    extract_masks(pipe, variables, root, serial_out, year="2016",
                  shard_by_process=False)
    # Byte-identical trees.
    for seq in sorted(os.listdir(serial_out)):
        a, b = os.path.join(serial_out, seq), os.path.join(shared_out, seq)
        files = sorted(os.listdir(a))
        assert sorted(os.listdir(b)) == files, (seq, files)
        for fn in files:
            assert open(os.path.join(a, fn), "rb").read() == \
                   open(os.path.join(b, fn), "rb").read(), (seq, fn)

    # Merged sharded scoring == serial scoring of the same tree.
    from slowfast_vos_tpu.eval.scorer import DavisScorer, summarize
    serial_metrics = DavisScorer(root, task="unsupervised", gt_set="val",
                                 year="2016").evaluate(
        os.path.join(work, "sharded_results", "unsupervised", "m"))
    want = summarize(serial_metrics)
    for k, v in want.items():
        assert abs(summary[k] - v) < 1e-12, (k, summary[k], v)
    assert set(per_obj) == set(serial_metrics["J"]["M_per_object"])

# OSVOS result merge across processes: fake per-sequence shard results
# (round-robin split of 3 sequences over 2 ranks), merged table must hold
# every sequence on every rank in global order.
from slowfast_vos_tpu.train.osvos import _merge_osvos_results

names = ["seq_a", "seq_b", "seq_c"]
mine = {
    n: {-1: {"jfmean": 0.5 + i, "jmean": 0.4, "fmean": 0.6, "eval_time": 1.0},
        0: {"jfmean": 0.7 + i, "jmean": 0.6, "fmean": 0.8, "eval_time": 1.0}}
    for i, n in enumerate(names)
    if i % 2 == rank
}
merged = _merge_osvos_results(mine, names)
assert set(merged) == set(names), merged
for i, n in enumerate(names):
    assert abs(merged[n][-1]["jfmean"] - (0.5 + i)) < 1e-9
    assert abs(merged[n][0]["jfmean"] - (0.7 + i)) < 1e-9

print(f"WORKER_OK rank={rank}", force=True)
"""


def test_two_process_sharded_eval(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    work = tmp_path / "work"
    work.mkdir()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            {
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(rank),
                "WORK_DIR": str(work),
                "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"WORKER_OK rank={rank}" in out, out
