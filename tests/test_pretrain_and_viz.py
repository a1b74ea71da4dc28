"""Mask R-CNN fine-tune path (no SlowFast), frame-level data, RPN proposal
extraction, qualitative eval/overlays, and aspect grouping."""
import os

import jax
import numpy as np
import pytest

from slowfast_vos_tpu.data.frames import DavisFrameDataset, frame_batches
from slowfast_vos_tpu.data.grouping import group_by_aspect_ratio, grouped_batches
from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.eval.visualize import evaluate_with_visualization, mask_iou, overlay
from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import init_variables
from slowfast_vos_tpu.train.pretrain import (
    build_maskrcnn_pipeline,
    extract_rpn_proposals,
    train_maskrcnn,
    warmup_step_lr,
)

TINY_CFG = DetectionConfig(
    rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=32,
    rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
    box_batch_size_per_image=32, mask_train_rois=8,
    detections_per_img=5, max_gt=3,
)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("davis17"))
    make_synthetic_davis(r, num_sequences=2, frames=5, hw=(60, 100), num_objects=2)
    return r


@pytest.fixture(scope="module")
def tiny():
    pipe, model = build_maskrcnn_pipeline(
        original_hw=(60, 100), min_size=64, max_size=128, cfg=TINY_CFG,
        backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def test_frame_dataset_splits(tmp_path):
    # Reference-exact split (maskrcnn_src.py:30-52): frames of sequences in
    # train.txt -> train, val.txt -> val, any other sequence dir -> test.
    r = str(tmp_path)
    make_synthetic_davis(r, num_sequences=2, frames=5, hw=(60, 100), num_objects=2)
    make_synthetic_davis(r, num_sequences=1, frames=4, hw=(60, 100), subset="val", start=2)
    make_synthetic_davis(r, num_sequences=1, frames=3, hw=(60, 100), subset=None, start=3)
    tr = DavisFrameDataset(r, "train", max_gt=3)
    va = DavisFrameDataset(r, "val", max_gt=3)
    te = DavisFrameDataset(r, "test", max_gt=3)
    assert (len(tr), len(va), len(te)) == (10, 4, 3)
    assert all(f"{r}/JPEGImages/480p/synth02/" in p for p, _ in va.frames)
    assert all(f"{r}/JPEGImages/480p/synth03/" in p for p, _ in te.frames)
    item = tr[0]
    assert item["image"].shape == (60, 100, 3)
    assert item["boxes"].shape == (3, 4)
    batches = list(frame_batches(tr, 2, seed=1))
    assert all(b["images"].shape == (2, 60, 100, 3) for b in batches)


def test_maskrcnn_train_updates_backbone(root, tiny):
    pipe, variables = tiny
    body_before = jax.tree.map(
        lambda x: np.asarray(x).copy(), variables["params"]["backbone"]["body"]
    )
    state, history = train_maskrcnn(
        pipe, davis_root=root, output_dir="/tmp/mrcnn_test_out",
        epochs=1, max_steps_per_epoch=2, variables=variables,
    )
    assert np.isfinite(history[0]["loss"])
    body_after = state.params["backbone"]["body"]
    # torchvision trainable_backbone_layers=3: layer2..4 train, while conv1 /
    # bn1 / layer1 (and every FrozenBN buffer) stay bit-identical
    # (`maskrcnn_src.py:190,253-255`).
    assert not np.array_equal(
        body_before["layer2_0"]["conv1"]["kernel"],
        np.asarray(body_after["layer2_0"]["conv1"]["kernel"]),
    )
    for frozen_key in ("conv1", "bn1", "layer1_0", "layer1_1", "layer1_2"):
        for b, a in zip(
            jax.tree_util.tree_leaves(body_before[frozen_key]),
            jax.tree_util.tree_leaves(body_after[frozen_key]),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert os.path.exists("/tmp/mrcnn_test_out/maskrcnn_model")


def test_extract_rpn_proposals(root, tiny, tmp_path):
    pipe, variables = tiny
    out = extract_rpn_proposals(
        pipe, variables, davis_root=root, output_path=str(tmp_path / "props.npz")
    )
    data = np.load(out)
    assert data["synth00/proposals"].shape == (5, 32, 4)
    assert data["synth00/valid"].shape == (5, 32)


def test_warmup_step_lr():
    sched = warmup_step_lr(1e-3, steps_per_epoch=10, warmup_iters=5)
    assert float(sched(0)) < 1e-3 / 100
    assert np.isclose(float(sched(7)), 1e-3)
    assert np.isclose(float(sched(10 * 3)), 1e-4)  # after 3 epochs: x0.1


def test_visualization_eval(root, tiny, tmp_path):
    pipe, variables = tiny
    # use the same synthetic tree as a pseudo-2017 val by evaluating train
    miou = evaluate_with_visualization(
        pipe, variables, davis_root=root, out_dir=str(tmp_path / "viz"),
        subset="train", year="2017", sequences=["synth00"], save_all_imgs=True,
    )
    assert 0.0 <= miou <= 1.0
    files = os.listdir(tmp_path / "viz")
    assert len(files) == 5  # one overlay per frame


def test_mask_iou_and_overlay():
    a = np.zeros((10, 10), bool); a[:5] = True
    b = np.zeros((10, 10), bool); b[2:7] = True
    assert np.isclose(mask_iou(a, b), 30 / 70)
    img = np.zeros((10, 10, 3), np.uint8)
    out = overlay(img, np.stack([a]), boxes=np.array([[1, 1, 8, 8]]))
    assert out.shape == (10, 10, 3) and out.max() > 0


@pytest.fixture(scope="module")
def mixed_root(tmp_path_factory):
    """Mixed-resolution tree: wide (48, 96) and tall (96, 48) sequences."""
    r = str(tmp_path_factory.mktemp("davis_mixed"))
    make_synthetic_davis(
        r, num_sequences=2, frames=5, hw=[(48, 96), (96, 48)], num_objects=1
    )
    return r


def test_frame_batches_train_flip(root):
    """train_flip=True samples the reference's RandomHorizontalFlip(0.5)
    (`maskrcnn_src.py:207-212`): ~half the yielded frames are mirrored with
    boxes+masks co-transformed, and the stream is deterministic (and
    prefetch-stable, since utils.prefetch preserves iteration order)."""
    from slowfast_vos_tpu.utils.prefetch import prefetch

    ds = DavisFrameDataset(root, "train", max_gt=3)
    n = len(ds)
    assert n == 10
    originals = [ds[i] for i in range(n)]

    def frames_of(batches):
        return [
            {k: b[k][j] for k in ("images", "boxes", "masks", "gt_valid")}
            for b in batches
            for j in range(b["images"].shape[0])
        ]

    # Run several epochs' worth of streams to get a stable flip-rate count.
    flips = total = 0
    for seed in range(6):
        got = frames_of(list(frame_batches(ds, 2, shuffle=False, seed=seed, train_flip=True)))
        for i, fr in enumerate(got):
            orig = originals[i]
            total += 1
            if np.array_equal(fr["images"], orig["image"]):
                np.testing.assert_array_equal(fr["boxes"], orig["boxes"])
                continue
            flips += 1
            np.testing.assert_array_equal(fr["images"], orig["image"][:, ::-1])
            np.testing.assert_array_equal(fr["masks"], orig["masks"][:, :, ::-1])
            w = orig["image"].shape[1]
            for g in range(3):
                if not orig["gt_valid"][g]:
                    np.testing.assert_array_equal(fr["boxes"][g], 0.0)
                    continue
                x1, y1, x2, y2 = orig["boxes"][g]
                np.testing.assert_allclose(fr["boxes"][g], [w - x2, y1, w - x1, y2])
    assert 0.25 * total < flips < 0.75 * total, (flips, total)

    # Deterministic per seed, and identical through the prefetch wrapper.
    a = frames_of(list(frame_batches(ds, 2, seed=3, train_flip=True)))
    b = frames_of(list(frame_batches(ds, 2, seed=3, train_flip=True)))
    with prefetch(frame_batches(ds, 2, seed=3, train_flip=True), depth=2) as pf:
        c = frames_of(list(pf))
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["images"], z["images"])
        np.testing.assert_array_equal(x["boxes"], y["boxes"])
        np.testing.assert_array_equal(x["boxes"], z["boxes"])


def test_mixed_resolution_grouped_batches(mixed_root):
    """frame_batches on mixed-resolution data: every batch is one aspect
    bucket on one shared padded canvas (this used to crash on np.stack)."""
    ds = DavisFrameDataset(mixed_root, "train", max_gt=3)
    assert len(set(ds.sizes())) == 2
    batches = list(frame_batches(ds, 2, seed=1))
    assert batches, "grouped batching yielded nothing"
    canvases = {b["images"].shape[1:3] for b in batches}
    # one canvas per aspect bucket, each a multiple of the 32-px divisor
    assert canvases == {(64, 96), (96, 64)}
    for b in batches:
        assert b["masks"].shape[-2:] == b["images"].shape[1:3]
        assert b["gt_valid"].any()
        # padded region is zero
        h = 48 if b["images"].shape[1] == 64 else 96
        assert (b["images"][:, h:, :, :] == 0).all()


def test_mixed_resolution_training_two_canvases(mixed_root):
    """End-to-end: train_maskrcnn over mixed-resolution data compiles one
    trainer per canvas and takes finite steps on both."""
    pipe, model = build_maskrcnn_pipeline(
        original_hw=(48, 96), min_size=48, max_size=96, cfg=TINY_CFG,
        backbone_batch=2, chunk=2,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    _state, history = train_maskrcnn(
        pipe, davis_root=mixed_root, output_dir="/tmp/mrcnn_mixed_out",
        epochs=1, batch_size=2, max_steps_per_epoch=4, variables=variables,
    )
    assert np.isfinite(history[0]["loss"])


def test_grouping():
    sizes = [(100, 100), (100, 200), (200, 100), (100, 210)]
    groups = group_by_aspect_ratio(sizes, k=3)
    gid = {i: g for g, idxs in groups.items() for i in idxs}
    assert gid[1] == gid[3]  # 2.0 and 2.1 quantize together
    assert gid[0] != gid[1] != gid[2]
    batches = list(grouped_batches(sizes, 2, shuffle=False))
    for b in batches:
        assert len({gid[i] for i in b}) == 1
