"""Production data-parallel drivers (VERDICT r2 item 1).

Checks that the shard_map DP machinery is actually wired into
`train_unsupervised`: the DP step's pmean'd loss equals the mean of the
per-window single-device losses at the same parameters/keys, and a short
DP training run (8 virtual CPU devices, >= 2 optimizer steps including a
wrap-filled trailing group) trains end-to-end with finite losses and the
same checkpoints/history contract as the serial path.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
    shard_windows,
)
from slowfast_vos_tpu.parallel.sharded import stack_windows
from slowfast_vos_tpu.train import Trainer
from slowfast_vos_tpu.train.trainer import train_unsupervised

from test_train_step import TINY_CFG, make_batch


@pytest.fixture(scope="module")
def tiny():
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def test_dp_step_loss_matches_stacked_single_device_windows(tiny):
    """pmean(loss) over the mesh == mean of per-window losses computed
    serially at the same params with the same per-window keys."""
    pipe, variables = tiny
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = make_mesh(n_dev)
    trainer = Trainer(pipe, lr=0.01)
    state0 = trainer.init_state(variables)
    state = replicate_state(state0, mesh)

    rng = np.random.default_rng(3)
    windows = [make_batch(rng) for _ in range(n_dev)]
    batch = shard_windows(stack_windows(windows), mesh)

    key = jax.random.PRNGKey(17)
    step = make_sharded_train_step(trainer, mesh)
    _, metrics = step(state, key, batch)
    dp_loss = float(metrics["loss"])

    serial = []
    for i, w in enumerate(windows):
        loss, _aux = trainer._loss_fn(
            state0.params,
            state0.frozen,
            state0.batch_stats,
            jax.random.fold_in(key, i),
            {k: jnp.asarray(v) for k, v in w.items()},
        )
        serial.append(float(loss))
    # f32: SPMD layout reorders the within-loss reductions vs the serial
    # evaluation; observed rel diff ~7e-5 at loss ~5.
    np.testing.assert_allclose(dp_loss, np.mean(serial), rtol=5e-4)


def test_dp_grads_equal_mean_of_window_grads(tiny):
    """One DP step must apply the pmean of per-window gradients — DDP
    allreduce semantics (`code/maskrcnn/train.py:102`)."""
    pipe, variables = tiny
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    trainer = Trainer(pipe, lr=0.01)
    state0 = trainer.init_state(variables)

    rng = np.random.default_rng(5)
    windows = [make_batch(rng) for _ in range(n_dev)]
    key = jax.random.PRNGKey(29)

    step = make_sharded_train_step(trainer, mesh)
    new_state, _ = step(
        replicate_state(state0, mesh), key, shard_windows(stack_windows(windows), mesh)
    )

    # Manual DP update: mean per-window grads -> same optax update.
    grads = []
    for i, w in enumerate(windows):
        g = jax.grad(lambda p: trainer._loss_fn(
            p, state0.frozen, state0.batch_stats,
            jax.random.fold_in(key, i),
            {k: jnp.asarray(v) for k, v in w.items()},
        )[0])(state0.params)
        grads.append(g)
    mean_grads = jax.tree.map(lambda *g: sum(g) / len(g), *grads)
    import optax

    updates, _ = trainer.tx.update(mean_grads, state0.opt_state, state0.params)
    want = optax.apply_updates(state0.params, updates)

    # bf16 compute inside the loss makes per-window grads differ at ~1%
    # relative between the SPMD and serial lowerings; the check still
    # discriminates pmean-of-grads from any single window's grads (those
    # differ by ~100%).
    got_leaves = jax.tree_util.tree_leaves(new_state.params)
    want_leaves = jax.tree_util.tree_leaves(want)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-5)


def test_train_unsupervised_data_parallel(tmp_path, tiny):
    """End-to-end DP driver: >= 2 DP steps (incl. a wrap-filled trailing
    group), finite losses, checkpoints + eval results written."""
    pipe, variables = tiny
    train_root = str(tmp_path / "train17")
    eval_root = str(tmp_path / "eval16")
    make_synthetic_davis(train_root, num_sequences=2, frames=12, hw=(60, 100), num_objects=2)
    make_synthetic_davis(
        eval_root, num_sequences=1, frames=4, hw=(60, 100), num_objects=1,
        year="2016", subset="val", seed=7,
    )
    out = str(tmp_path / "out")
    # 2 sequences x 6 windows = 12 windows; with 8 devices that is one full
    # group + one wrap-filled group per epoch = 2 DP optimizer steps.
    state, history = train_unsupervised(
        pipe,
        train_root=train_root,
        eval_root=eval_root,
        output_dir=out,
        epochs=1,
        variables=variables,
        data_parallel=True,
    )
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    ev = history[0]["eval"]
    assert ev is not None and 0.0 <= ev["jf"] <= 1.0
    assert os.path.exists(os.path.join(out, "ckpt_last"))
    # 12 windows / 8 devices -> 2 logged DP steps (batch_loss entries)
    import json
    from glob import glob

    logs = []
    for path in glob(os.path.join(out, "logs", "*.jsonl")):
        logs += [json.loads(ln) for ln in open(path)]
    batch_losses = [l for l in logs if l.get("tag") == "train/batch_loss"]
    assert len(batch_losses) == 2, batch_losses
