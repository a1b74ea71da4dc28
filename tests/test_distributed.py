"""Two-process CPU test of the multi-host path.

Exercises the reference's distributed contract (`code/maskrcnn/utils.py:
261-327`) on the TPU-native runtime: `init_distributed_mode` env discovery →
`jax.distributed.initialize`, a process-spanning mesh from
`parallel.mesh.make_mesh`, a cross-process psum through the same shard_map
formulation `parallel/sharded.py` uses, `process_allgather`-backed
`SmoothedValue.synchronize_between_processes`, and master-only print gating.

Each worker is a fresh interpreter (subprocess) pinned to the CPU platform
with 2 virtual devices, so the pair forms a 2-process x 2-device = 4-device
cluster on one machine — the same topology shape as one process per TPU host.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from slowfast_vos_tpu.parallel.distributed import (
    init_distributed_mode, get_rank, get_world_size, is_main_process,
    local_batch_slice, save_on_master,
)

assert init_distributed_mode(verbose=False), "env should select distributed mode"
assert get_world_size() == 2, jax.process_count()
assert jax.device_count() == 4, jax.devices()
rank = get_rank()

# Mesh over ALL processes' devices; psum crosses the process boundary.
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from slowfast_vos_tpu.parallel.mesh import make_mesh

mesh = make_mesh(axis_names=("data",))
assert mesh.devices.size == 4

def per_device(x):
    return jax.lax.psum(x, "data")

import numpy as np
from jax.experimental import multihost_utils

global_x = np.arange(4, dtype=np.float32) + 1.0  # 1..4 over 4 devices
local = global_x[local_batch_slice(4)]
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
out = jax.jit(
    jax.shard_map(per_device, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                  check_vma=False)
)(arr)
vals = multihost_utils.process_allgather(out.addressable_shards[0].data)
assert np.allclose(np.asarray(vals), 10.0), vals

# SmoothedValue cross-process reduction: counts/totals sum over processes.
from slowfast_vos_tpu.utils.smoothing import SmoothedValue
sv = SmoothedValue()
sv.update(float(rank + 1), n=3)  # rank0: total 3, rank1: total 6
sv.synchronize_between_processes()
assert sv.count == 6, sv.count
assert abs(sv.global_avg - 1.5) < 1e-6, sv.global_avg

# Master-only helpers.
marker = []
save_on_master(lambda: marker.append(1))
assert bool(marker) == is_main_process()

# COCO eval shard merge (reference coco_eval.py:163-201): each rank scores a
# shard (one own image + the shared image 0); the merge must dedup image 0
# and reproduce the single-process result over the union.
from slowfast_vos_tpu.eval.coco import coco_map, merge_across_processes

def img(seed):
    r = np.random.default_rng(seed)
    boxes = np.sort(r.uniform(0, 50, (2, 2, 2)), axis=1).reshape(2, 4)  # x1<=x2, y1<=y2
    return (
        {"boxes": boxes + r.uniform(0, 2, (2, 4)), "labels": np.ones(2, np.int64),
         "scores": r.uniform(0.5, 1.0, 2), "valid": np.ones(2, bool)},
        {"boxes": boxes, "labels": np.ones(2, np.int64), "valid": np.ones(2, bool)},
    )

shared = img(100)
own = img(rank)
ids = [100, rank]
preds = [shared[0], own[0]]
gts = [shared[1], own[1]]
mids, mpreds, mgts = merge_across_processes(ids, preds, gts)
assert sorted(mids) == [0, 1, 100], mids
want_p, want_g = zip(*(img(i) for i in (100, 0, 1)))
got = coco_map(mpreds, mgts, kind="bbox")
want = coco_map(list(want_p), list(want_g), kind="bbox")
assert abs(got["mAP"] - want["mAP"]) < 1e-9, (got, want)

print(f"WORKER_OK rank={rank}", force=True)  # gated print: force on non-master
"""


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            {
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(rank),
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
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"WORKER_OK rank={rank}" in out, out


def test_distributed_env_discovery(monkeypatch):
    from slowfast_vos_tpu.parallel.distributed import distributed_env

    for var in (
        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
        "RANK", "WORLD_SIZE", "MASTER_ADDR", "MASTER_PORT",
        "SLURM_PROCID", "SLURM_NTASKS", "SLURM_STEP_NODELIST",
        "JAX_AUTODETECT_DISTRIBUTED",
    ):
        monkeypatch.delenv(var, raising=False)
    assert distributed_env() is None

    # torch-style env, as the reference reads it (utils.py:307-312).
    monkeypatch.setenv("RANK", "1")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "1234")
    env = distributed_env()
    assert env == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 1,
    }

    # SLURM (utils.py:313-315); RANK takes precedence so clear it.
    monkeypatch.delenv("RANK")
    monkeypatch.delenv("WORLD_SIZE")
    monkeypatch.setenv("SLURM_PROCID", "2")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node[3-7],node9")
    env = distributed_env()
    assert env["num_processes"] == 8 and env["process_id"] == 2
    assert env["coordinator_address"].startswith("node3:")
