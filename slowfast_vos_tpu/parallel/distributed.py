"""Multi-host initialization and process utilities.

TPU-native replacement for the reference's `init_distributed_mode`
(`code/maskrcnn/utils.py:305-327`): the reference discovers RANK /
WORLD_SIZE (or SLURM_PROCID) from the environment, initializes an NCCL
process group, pins a GPU, and gates printing to the master rank. Here the
runtime is `jax.distributed.initialize` — one controller process per host,
XLA compiles the collectives (psum/all_gather over ICI/DCN), no process
group object threads through the code. After initialization every process
sees the GLOBAL device list, so `parallel.mesh.make_mesh` and the
shard_map data-parallel step (`parallel/sharded.py`) work unchanged
multi-host: each process feeds its local shard, XLA runs one SPMD program.

Environment contracts honored (first match wins), mirroring the
reference's env/SLURM fallthrough order:

* JAX-native: ``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` +
  ``JAX_PROCESS_ID``] — explicit, used by our tests and launchers.
* torch-style (what `utils.py:307-312` reads): ``RANK`` + ``WORLD_SIZE``
  [+ ``MASTER_ADDR``/``MASTER_PORT``] — so existing reference launch
  scripts keep working.
* SLURM (`utils.py:313-315`): ``SLURM_PROCID`` + ``SLURM_NTASKS`` +
  ``SLURM_STEP_NODELIST`` (first node = coordinator).
* Cloud TPU pods: none of the above set but more than one slice host —
  `jax.distributed.initialize()` autodetects; we attempt it only when
  ``JAX_AUTODETECT_DISTRIBUTED=1`` to keep single-host runs hermetic.

If nothing matches, this is single-process mode and `init_distributed_mode`
is a no-op returning False — exactly the reference's "Not using distributed
mode" branch (`utils.py:313-316`).
"""
from __future__ import annotations

import os


def distributed_env() -> dict | None:
    """Discover multi-process launch parameters from the environment.

    Returns kwargs for `jax.distributed.initialize`, or None when the
    environment describes a single-process run.
    """
    env = os.environ
    if "JAX_COORDINATOR_ADDRESS" in env:
        out: dict = {"coordinator_address": env["JAX_COORDINATOR_ADDRESS"]}
        if "JAX_NUM_PROCESSES" in env:
            out["num_processes"] = int(env["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in env:
            out["process_id"] = int(env["JAX_PROCESS_ID"])
        return out
    if "RANK" in env and "WORLD_SIZE" in env:  # utils.py:307-312
        addr = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "29500")
        return {
            "coordinator_address": f"{addr}:{port}",
            "num_processes": int(env["WORLD_SIZE"]),
            "process_id": int(env["RANK"]),
        }
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:  # utils.py:313-315
        nodelist = env.get("SLURM_STEP_NODELIST", env.get("SLURM_NODELIST", ""))
        first = _first_slurm_host(nodelist) or "127.0.0.1"
        port = env.get("MASTER_PORT", "29500")
        return {
            "coordinator_address": f"{first}:{port}",
            "num_processes": int(env["SLURM_NTASKS"]),
            "process_id": int(env["SLURM_PROCID"]),
        }
    if env.get("JAX_AUTODETECT_DISTRIBUTED") == "1":
        return {}  # let jax.distributed.initialize autodetect (TPU pods)
    return None


def _first_slurm_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist: 'node[3-7,9],gpu2' -> 'node3'.

    Minimal expansion (stem + first range start, zero-padding preserved) —
    enough to name the coordinator without shelling out to scontrol.
    """
    head = nodelist.split(",")[0]
    if "[" not in head:
        return head
    stem, rng = head.split("[", 1)
    first = rng.rstrip("]").split(",")[0].split("-")[0]
    return stem + first


_initialized = False


def init_distributed_mode(*, verbose: bool = True) -> bool:
    """Initialize the multi-process runtime if the environment asks for it.

    Safe to call unconditionally from every CLI (idempotent). Returns True
    when running multi-process. Single-process: no-op, False — matching the
    reference's fallthrough (`utils.py:313-316`).
    """
    global _initialized
    import jax

    kwargs = distributed_env()
    if kwargs is None:
        if verbose:
            print("Not using distributed mode")
        return False
    if not _initialized:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    if verbose and is_main_process():
        print(
            f"Initialized jax.distributed: {jax.process_count()} processes, "
            f"{jax.device_count()} global / {jax.local_device_count()} local devices"
        )
    setup_printing(is_main_process())
    return True


_barrier_count = 0


def host_barrier(name: str, timeout_s: int = 1800) -> None:
    """Block until every process reaches this barrier.

    Uses the jax.distributed coordination service (gRPC) rather than a
    device collective: `multihost_utils.sync_global_devices` rides a Gloo
    CPU collective whose context-init rendezvous times out after 30 s, which
    real workloads exceed whenever processes reach the barrier skewed (e.g.
    one process drew one more eval sequence than another). Single-process:
    no-op. Barrier ids are auto-uniqued per call site order, so every
    process must execute the same barrier sequence (same discipline as any
    collective)."""
    global _barrier_count
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed as _jax_distributed

    client = _jax_distributed.global_state.client
    if client is None:
        return
    _barrier_count += 1
    client.wait_at_barrier(f"{name}_{_barrier_count}", timeout_in_ms=timeout_s * 1000)


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def save_on_master(save_fn, *args, **kwargs):
    """Run a checkpoint/artifact write only on process 0 (the reference's
    `save_on_master`, `utils.py:300-302`). Returns the fn result on master,
    None elsewhere."""
    if is_main_process():
        return save_fn(*args, **kwargs)
    return None


def setup_printing(is_master: bool) -> None:
    """Silence `print` on non-master processes unless forced — the
    reference's `setup_for_distributed` (`utils.py:261-274`)."""
    import builtins

    builtin_print = getattr(builtins, "_slowfast_vos_print", builtins.print)
    builtins._slowfast_vos_print = builtin_print

    def gated_print(*args, force: bool = False, **kwargs):
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = gated_print


def local_batch_slice(global_size: int) -> slice:
    """The contiguous slice of a globally-ordered batch this process feeds
    (replaces DistributedSampler, `code/maskrcnn/train.py:73-74`): global
    arrays are sharded evenly by process index; sizes must divide evenly
    (pad upstream — all shapes are static)."""
    w, r = get_world_size(), get_rank()
    assert global_size % w == 0, f"global batch {global_size} % {w} processes != 0"
    per = global_size // w
    return slice(r * per, (r + 1) * per)
