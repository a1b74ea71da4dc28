"""OSVOS sweep machinery: grid runner with JSON resume-by-skip and the
per-epoch aggregation (reference run_osvos_experiments / summarize)."""
import json
import os

import jax
import pytest

from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.train.osvos import (
    run_osvos_experiments,
    run_osvos_for_all_sequences,
    summarize_osvos_results,
)

TINY_CFG = DetectionConfig(
    rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=32,
    rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
    box_batch_size_per_image=32, mask_train_rois=8,
    detections_per_img=5, max_gt=3,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("d16"))
    make_synthetic_davis(root, num_sequences=2, frames=5, hw=(60, 100), num_objects=1,
                         year="2016", subset="val")
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return root, pipe, variables


def test_sweep_with_resume_skip(setup, tmp_path):
    root, pipe, variables = setup
    exp_dir = str(tmp_path / "experiments")
    kwargs = dict(
        davis_root=root, results_root=str(tmp_path / "res"),
        experiments_dir=exp_dir,
        freeze_options=("BB_SF",), scales=(0.25,), lrs=(1e-3,),
        sequences=("synth00",), epochs=1, items_per_epoch=2,
    )
    run_osvos_experiments(pipe, variables, **kwargs)
    files = [f for f in os.listdir(exp_dir) if f.endswith(".json")]
    assert len(files) == 1
    with open(os.path.join(exp_dir, files[0])) as f:
        results = json.load(f)
    assert "synth00" in results and "-1" in results["synth00"] and "0" in results["synth00"]

    # resume-by-skip: marker content must survive a second run untouched
    marker = os.path.join(exp_dir, files[0])
    with open(marker, "w") as f:
        f.write('{"sentinel": true}')
    run_osvos_experiments(pipe, variables, **kwargs)
    with open(marker) as f:
        assert json.load(f) == {"sentinel": True}


def test_all_sequences_and_summary(setup, tmp_path):
    root, pipe, variables = setup
    out_json = str(tmp_path / "all.json")
    run_osvos_for_all_sequences(
        pipe, variables, davis_root=root, results_root=str(tmp_path / "res2"),
        output_json=out_json, items_per_epoch=2,
        cfg=__import__("slowfast_vos_tpu.train.osvos", fromlist=["ExperimentConfig"]).ExperimentConfig(
            freeze="BB_SF", lr=1e-3, scale=0.25, epochs=1
        ),
    )
    rows = summarize_osvos_results(out_json, epochs=1)
    assert len(rows) == 1
    assert 0.0 <= rows[0]["jf"] <= 1.0
