"""Device-level data-parallel inference (parallel/dp_infer.py).

VERDICT r3 item 3: a single process with N local chips must use all of them
for eval. These tests run on the conftest's 8-virtual-CPU mesh and assert the
lockstep sequence streams are exactly the serial path:

* `DeviceParallelInference.infer_group` output == `Pipeline.infer_sequence`
  per sequence, for ragged lengths spanning multiple superchunks (carry path)
  and a wrap-filled trailing group;
* `extract_masks(device_parallel=True)` writes a PNG tree byte-identical to
  the serial `device_parallel=False` tree.
"""
import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.eval.glue import extract_masks
from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.parallel.dp_infer import DeviceParallelInference, infer_mesh

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
def setup():
    # superchunk=4 so the longest test sequence spans several chunks and the
    # sharded F-1 feature carry is exercised, not just the first-chunk path.
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4, superchunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def _assert_same_dets(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["valid"], w["valid"])
        np.testing.assert_array_equal(g["union_mask"], w["union_mask"])
        v = w["valid"]
        np.testing.assert_array_equal(g["boxes"][v], w["boxes"][v])
        np.testing.assert_array_equal(g["scores"][v], w["scores"][v])
        np.testing.assert_array_equal(g["labels"][v], w["labels"][v])


def test_infer_group_matches_serial_ragged_lengths(setup):
    pipe, variables = setup
    mesh = infer_mesh()
    assert mesh is not None and mesh.devices.size >= 2, jax.local_devices()
    mesh = Mesh(mesh.devices[:4], ("data",))

    rng = np.random.default_rng(7)
    # Ragged: 9 frames = 3 superchunks (carry twice), 3 = one, 6 = two; the
    # group of 3 on a 4-device mesh also exercises the wrap-fill.
    seqs = [
        rng.integers(0, 255, (t, 60, 100, 3), dtype=np.uint8).astype(np.uint8)
        for t in (9, 3, 6)
    ]
    dp = DeviceParallelInference(pipe, mesh)
    results = dp.infer_group(variables, seqs)
    assert len(results) == 3
    for seq, dets in zip(seqs, results):
        _assert_same_dets(dets, pipe.infer_sequence(variables, seq))


def test_extract_masks_device_parallel_tree_byte_identical(setup, tmp_path):
    pipe, variables = setup
    root = str(tmp_path / "davis")
    make_synthetic_davis(
        root, num_sequences=3, frames=5, hw=(60, 100), num_objects=1,
        year="2016", subset="val", seed=11,
    )
    serial_out = str(tmp_path / "serial")
    dp_out = str(tmp_path / "dp")
    extract_masks(
        pipe, variables, root, serial_out, year="2016", device_parallel=False
    )
    extract_masks(pipe, variables, root, dp_out, year="2016", device_parallel=True)
    seqs = sorted(os.listdir(serial_out))
    assert sorted(os.listdir(dp_out)) == seqs and len(seqs) == 3
    for seq in seqs:
        files = sorted(os.listdir(os.path.join(serial_out, seq)))
        assert sorted(os.listdir(os.path.join(dp_out, seq))) == files
        for fn in files:
            a = open(os.path.join(serial_out, seq, fn), "rb").read()
            b = open(os.path.join(dp_out, seq, fn), "rb").read()
            assert a == b, (seq, fn)
