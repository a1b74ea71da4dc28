"""Training-step smoke + semantics: loss finite and decreasing on a fixed
batch, only trainable subtrees update, frozen backbone/RPN stay bit-identical."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.train import Trainer

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


def make_batch(rng, n_center=2, fast=3, hw=(60, 100), max_gt=3):
    w = n_center + fast - 1
    h0, w0 = hw
    images = rng.uniform(0, 1, (w, h0, w0, 3)).astype(np.float32)
    boxes = np.zeros((n_center, max_gt, 4), np.float32)
    masks = np.zeros((n_center, max_gt, h0, w0), np.uint8)
    labels = np.ones((n_center, max_gt), np.int32)
    gt_valid = np.zeros((n_center, max_gt), bool)
    for f in range(n_center):
        for g in range(2):
            x1, y1 = rng.uniform(5, 40, 2)
            bw, bh = rng.uniform(15, 30, 2)
            x2, y2 = min(x1 + bw, w0 - 1), min(y1 + bh, h0 - 1)
            boxes[f, g] = [x1, y1, x2, y2]
            masks[f, g, int(y1) : int(y2), int(x1) : int(x2)] = 1
            gt_valid[f, g] = True
    return {
        "images": jnp.asarray(images),
        "feat_valid": jnp.ones((w,), bool),
        "frame_valid": jnp.ones((n_center,), bool),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels),
        "gt_valid": jnp.asarray(gt_valid),
        "masks": jnp.asarray(masks),
    }


@pytest.fixture(scope="module")
def setup():
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    trainer = Trainer(pipe, lr=0.01)
    state = trainer.init_state(variables)
    return pipe, trainer, state


def test_train_step_runs_and_learns(setup):
    _, trainer, state = setup
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    frozen_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.frozen)
    sf_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["slow_fast"])[0]
    ).copy()

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = trainer.step(state, sub, batch)
        assert np.isfinite(float(metrics["loss"])), metrics
        losses.append(float(metrics["loss_classifier"] + metrics["loss_box_reg"] + metrics["loss_mask"]))

    # trainable params moved
    sf_after = np.asarray(jax.tree_util.tree_leaves(state.params["slow_fast"])[0])
    assert not np.allclose(sf_before, sf_after)
    # frozen params bit-identical
    for b, a in zip(
        jax.tree_util.tree_leaves(frozen_before),
        jax.tree_util.tree_leaves(state.frozen),
    ):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # optimizing a fixed batch should reduce the trainable loss
    assert losses[-1] < losses[0], losses


def test_invalid_frames_produce_zero_trainable_loss(setup):
    _, trainer, state = setup
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    batch["frame_valid"] = jnp.zeros_like(batch["frame_valid"])
    _, metrics = trainer.step(state, jax.random.PRNGKey(2), batch)
    assert float(metrics["loss_classifier"]) == 0.0
    assert float(metrics["loss_mask"]) == 0.0


def test_project_masks_on_boxes_matches_gather_oracle():
    """The separable-matmul projection must match the 4-tap bilinear gather
    formulation (torchvision roi_align(spatial_scale=1) semantics) exactly,
    including border clamping and out-of-range zeroing."""
    from slowfast_vos_tpu.models.heads import project_masks_on_boxes

    rng = np.random.default_rng(7)
    g, h, w, out = 4, 40, 64, 14
    masks = (rng.random((g, h, w)) > 0.5).astype(np.float32)
    boxes = np.array(
        [
            [5.3, 7.1, 30.2, 25.9],
            [-6.0, -3.0, 10.0, 12.0],   # crosses the top-left border
            [50.0, 30.0, 80.0, 55.0],   # crosses the bottom-right border
            [12.0, 9.0, 12.4, 9.2],     # sub-pixel (min-size 1 kicks in)
            [0.0, 0.0, 63.0, 39.0],     # whole canvas
        ],
        np.float32,
    )
    gt_idx = np.array([0, 1, 2, 3, 1], np.int32)

    sr = 2
    s = out * sr
    want = np.zeros((len(boxes), out, out), np.float32)
    for r, (bx, gi) in enumerate(zip(boxes, gt_idx)):
        x1, y1, x2, y2 = bx
        rh, rw = max(y2 - y1, 1.0), max(x2 - x1, 1.0)
        steps = np.arange(s) + 0.5
        ys = y1 + steps * rh / s
        xs = x1 + steps * rw / s
        acc = np.zeros((s, s), np.float32)
        for i, yc in enumerate(ys):
            for j, xc in enumerate(xs):
                if not (-1.0 <= yc <= h and -1.0 <= xc <= w):
                    continue
                y = min(max(yc, 0.0), h - 1.0)
                x = min(max(xc, 0.0), w - 1.0)
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                ly, lx = y - y0, x - x0
                m = masks[gi]
                acc[i, j] = (
                    m[y0, x0] * (1 - ly) * (1 - lx)
                    + m[y0, x1i] * (1 - ly) * lx
                    + m[y1i, x0] * ly * (1 - lx)
                    + m[y1i, x1i] * ly * lx
                )
        want[r] = acc.reshape(out, sr, out, sr).mean(axis=(1, 3))

    got = np.asarray(
        project_masks_on_boxes(
            jnp.asarray(masks), jnp.asarray(gt_idx), jnp.asarray(boxes), out
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
