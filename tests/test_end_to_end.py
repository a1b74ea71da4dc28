"""Full-stack integration: synthetic DAVIS -> short unsupervised training with
per-epoch official J&F eval -> checkpoint round-trip -> OSVOS fine-tune step.
This is the test-pyramid capstone the reference lacks (its de-facto
integration test was 'run a full evaluation before training', train.py:95-96).
"""
import os

import jax
import numpy as np
import pytest

from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.train.osvos import ExperimentConfig, train_osvos_sequence
from slowfast_vos_tpu.train.trainer import train_unsupervised
from slowfast_vos_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

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


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    train_root = str(tmp_path_factory.mktemp("train17"))
    eval_root = str(tmp_path_factory.mktemp("eval16"))
    make_synthetic_davis(train_root, num_sequences=1, frames=6, hw=(60, 100), num_objects=2)
    make_synthetic_davis(
        eval_root, num_sequences=1, frames=6, hw=(60, 100), num_objects=1,
        year="2016", subset="val", seed=7,
    )
    return train_root, eval_root


@pytest.fixture(scope="module")
def tiny():
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def test_unsupervised_train_and_eval(roots, tiny, tmp_path):
    train_root, eval_root = roots
    pipe, variables = tiny
    out = str(tmp_path / "out")
    state, history = train_unsupervised(
        pipe,
        train_root=train_root,
        eval_root=eval_root,
        output_dir=out,
        epochs=1,
        max_windows_per_epoch=2,
        variables=variables,
    )
    assert len(history) == 1
    ev = history[0]["eval"]
    assert ev is not None and 0.0 <= ev["jf"] <= 1.0
    assert np.isfinite(history[0]["loss"])
    # results PNG layout written
    res = os.path.join(out, "results", "unsupervised", "slowfast_1-3", "synth00")
    assert os.path.exists(os.path.join(res, "00000.png"))
    # checkpoints exist and round-trip
    restored, meta = restore_checkpoint(os.path.join(out, "ckpt_last"), target=state)
    assert meta["epoch"] == 0
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_osvos_finetune(roots, tiny, tmp_path):
    _, eval_root = roots
    pipe, variables = tiny
    results = train_osvos_sequence(
        pipe,
        variables,
        davis_root=eval_root,
        sequence_name="synth00",
        results_root=str(tmp_path / "res"),
        cfg=ExperimentConfig(freeze="BB_SF", lr=1e-3, scale=0.25, epochs=1),
        items_per_epoch=2,
        eval_year="2016",
    )
    assert -1 in results and 0 in results
    for r in results.values():
        assert 0.0 <= r["jfmean"] <= 1.0


def test_checkpoint_roundtrip_plain(tmp_path, tiny):
    _, variables = tiny
    path = str(tmp_path / "ck")
    save_checkpoint(path, variables, meta={"tag": "test"})
    restored, meta = restore_checkpoint(path, target=variables)
    assert meta["tag"] == "test"
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_variables_interop(tmp_path, tiny):
    """Checkpoints hand off between stages with different optimizers: both
    TrainState and raw-variables layouts load via utils.checkpoint.load_variables."""
    from slowfast_vos_tpu.train import Trainer
    from slowfast_vos_tpu.utils.checkpoint import load_variables

    pipe, variables = tiny
    # raw variables layout
    p1 = str(tmp_path / "vars_ck")
    save_checkpoint(p1, variables)
    lv = load_variables(p1)
    a = jax.tree_util.tree_leaves(variables["params"])[0]
    b = jax.tree_util.tree_leaves(lv["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # TrainState layout (trainable/frozen split must merge back)
    trainer = Trainer(pipe, lr=0.01)
    state = trainer.init_state(variables)
    p2 = str(tmp_path / "state_ck")
    save_checkpoint(p2, state)
    lv2 = load_variables(p2)
    assert set(lv2["params"]) == set(variables["params"])
    for k in variables["params"]:
        xa = jax.tree_util.tree_leaves(variables["params"][k])[0]
        xb = jax.tree_util.tree_leaves(lv2["params"][k])[0]
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
