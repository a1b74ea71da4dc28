"""End-to-end smoke test of the inference pipeline on a tiny canvas with random
weights: shapes, validity semantics, finiteness, and chunking across sequence
lengths that are not multiples of the chunk size."""
import os

import jax
import numpy as np
import pytest

from slowfast_vos_tpu.models.config import DetectionConfig
from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

TINY_CFG = DetectionConfig(
    rpn_pre_nms_top_n_test=64,
    rpn_post_nms_top_n_test=32,
    rpn_pre_nms_top_n_train=64,
    rpn_post_nms_top_n_train=32,
    detections_per_img=5,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
    pipe, model = build_pipeline(
        slow=1,
        fast=3,
        original_hw=(60, 100),
        min_size=64,
        max_size=128,
        cfg=TINY_CFG,
        backbone_batch=4,
        chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def test_infer_sequence_shapes(tiny_pipeline):
    pipe, variables = tiny_pipeline
    t = 6  # not a multiple of chunk=4
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (t, 60, 100, 3), dtype=np.uint8)
    dets = pipe.infer_sequence(variables, images, instance_masks=True)
    assert len(dets) == t
    for d in dets:
        assert d["boxes"].shape == (5, 4)
        assert d["scores"].shape == (5,)
        assert d["masks"].shape == (5, 60, 100)
        assert d["union_mask"].shape == (60, 100)
        assert np.isfinite(d["boxes"]).all()
        assert np.isfinite(d["masks"]).all()
        assert (d["masks"] >= 0).all() and (d["masks"] <= 1).all()
        # boxes are in ORIGINAL resolution
        assert (d["boxes"][:, [0, 2]] <= 100 + 1e-3).all()
        assert (d["boxes"][:, [1, 3]] <= 60 + 1e-3).all()
    # union path (default) agrees with instance-mask union
    dets2 = pipe.infer_sequence(variables, images)
    for d, d2 in zip(dets, dets2):
        manual = ((d["masks"] >= 0.5) & d["valid"][:, None, None]).any(0)
        np.testing.assert_array_equal(manual, d2["union_mask"].astype(bool))


def test_transform_geometry(tiny_pipeline):
    pipe, _ = tiny_pipeline
    tr = pipe.transform
    # min side 60 -> 64 makes max side 100*64/60=106.7 ≤ 128 -> ok; torchvision
    # FLOORS the scaled extent (recompute_scale_factor), so 106 not 107.
    assert tr.resized_hw == (64, 106)
    assert tr.canvas_hw == (64, 128)
    import jax.numpy as jnp

    boxes = jnp.array([[10.0, 6.0, 50.0, 30.0]])
    fwd = tr.transform_boxes(boxes)
    back = tr.inverse_boxes(fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), rtol=1e-5)


def test_superchunk_matches_staged_path():
    """The fused one-call superchunk graph must reproduce the staged
    (backbone->detect_chunk->finalize) path. Run in f32: with random weights
    the 1000 proposal scores cluster so tightly that bf16 batch-size rounding
    legitimately reorders winners."""
    import jax
    import jax.numpy as jnp

    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4, dtype=jnp.float32,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    t = 5
    images = rng.integers(0, 255, (t, 60, 100, 3), dtype=np.uint8)

    fused = pipe.infer_sequence(variables, images)

    # staged path: reuse the retained stage functions
    feats_padded, proposals, pvalid = pipe.compute_sequence_features(variables, images)
    e = pipe.chunk
    halo = pipe.halo_left + pipe.halo_right
    tp = -(-t // e) * e
    extra = tp - t
    feats_padded = [jnp.pad(f, ((0, extra), (0, 0), (0, 0), (0, 0))) for f in feats_padded]
    proposals = jnp.pad(proposals, ((0, extra), (0, 0), (0, 0)))
    pvalid = jnp.pad(pvalid, ((0, extra), (0, 0)))
    idx = 0
    for c in range(0, t, e):
        window = [f[c : c + e + halo] for f in feats_padded]
        boxes, scores, labels, valid, _m = pipe._detect_chunk(
            variables, window, proposals[c : c + e], pvalid[c : c + e]
        )
        for f in range(min(e, t - c)):
            # bf16 conv rounding differs with backbone batch size (7-frame
            # fused window vs padded-8 staged batches), so coordinates drift
            # sub-pixel and low-score slots reorder near ties. Structural
            # equivalence = top detection overlaps almost perfectly and has
            # nearly the same score.
            a = fused[idx]["boxes"][0]
            b = np.asarray(pipe.transform.inverse_boxes(boxes[f]))[0]
            lt = np.maximum(a[:2], b[:2])
            rb = np.minimum(a[2:], b[2:])
            inter = np.prod(np.clip(rb - lt, 0, None))
            area = lambda x: max((x[2] - x[0]) * (x[3] - x[1]), 1e-6)
            iou = inter / (area(a) + area(b) - inter)
            assert iou > 0.9, f"frame {idx}: top-box IoU {iou:.3f} ({a} vs {b})"
            np.testing.assert_allclose(
                fused[idx]["scores"][0], np.asarray(scores[f])[0], atol=5e-3
            )
            np.testing.assert_array_equal(fused[idx]["valid"], np.asarray(valid[f]))
            idx += 1


def test_yuv420_roundtrip_close():
    """Host rgb->yuv420 then device reconstruction must match the RGB canvas
    closely on smooth content (chroma subsampling only hurts chroma edges)."""
    from slowfast_vos_tpu.models.transform import ImageTransform, rgb_to_yuv420
    import jax.numpy as jnp

    tf = ImageTransform((60, 100), min_size=64, max_size=128)
    rng = np.random.default_rng(0)
    # smooth gradient + low-frequency color field
    yy, xx = np.mgrid[0:60, 0:100].astype(np.float32)
    base = np.stack([yy * 2, xx * 1.5, (yy + xx)], -1)
    imgs = np.clip(base[None] + rng.normal(0, 2, (3, 60, 100, 3)), 0, 255).astype(np.uint8)

    ref = np.asarray(tf(jnp.asarray(imgs)))
    y, uv = rgb_to_yuv420(imgs)
    got = np.asarray(tf.from_yuv420(jnp.asarray(y), jnp.asarray(uv)))
    assert got.shape == ref.shape
    # normalized units: std ~0.225 => 0.1 ~= 5.7 gray levels
    err = np.abs(got - ref)
    assert np.percentile(err, 99) < 0.12, np.percentile(err, 99)
    assert err.mean() < 0.03, err.mean()


def test_yuv420_transport_end_to_end(tiny_pipeline):
    """The yuv420 transport drives the full pipeline: same output contract
    as rgb transport (shapes, validity, finiteness, original-resolution
    boxes). Numeric fidelity of the transport itself is pinned by
    `test_yuv420_roundtrip_close` — detection-level equivalence is NOT
    asserted here because with random weights the detector is chaotic under
    the ±1-gray-level chroma loss (real-weight fidelity is a RUNBOOK.md
    item)."""
    pipe, variables = tiny_pipeline
    rng = np.random.default_rng(1)
    t = 4
    images = rng.integers(0, 255, (t, 60, 100, 3), dtype=np.uint8)
    dets = pipe.infer_sequence(variables, images, transport="yuv420")
    assert len(dets) == t
    for d in dets:
        assert d["boxes"].shape == (5, 4)
        assert np.isfinite(d["boxes"]).all()
        assert d["union_mask"].shape == (60, 100)
        assert (d["boxes"][:, [0, 2]] <= 100 + 1e-3).all()


def test_carry_path_matches_plain_superchunks():
    """Steady-state chunks reuse the carried overlap features
    (`_superchunk_carry_impl`); results must be BIT-identical to running
    every chunk through the plain full-window graph (the overlap frames'
    masked features are deterministic recomputation either way). Covers a
    3-chunk sequence with a partial last chunk.

    Runs in a SINGLE-device CPU subprocess (`scripts/verify_carry_tpu.py`),
    because the contract is per-thread-budget, not universal (round-5
    finding): under this suite's 8-VIRTUAL-device CPU mesh, XLA:CPU's
    reduced per-device thread budget partitions conv reductions differently
    for the batch-SC carry backbone vs the batch-SC+F-1 plain backbone —
    per-frame backbone outputs differ at bf16 ulp (max 6.3e-2, 6-11% of
    elements per FPN level, isolated-jit reproduction) and the drift flips
    NMS ties. Padding the carry batch to SC+F-1 does not restore equality
    (same-shape subgraphs inside different mega-graph executables still
    partition differently). On single-device XLA:CPU (this subprocess) the
    contract is exact; on the TPU chip the same script measured a small
    bounded drift (boxes <= 0.28 px, scores <= 2.1e-3) — recorded in
    `scripts/verify_carry_tpu.py`'s docstring, far inside the 0.5-pt J&F
    parity budget."""
    import subprocess
    import sys

    env = os.environ.copy()
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "verify_carry_tpu.py"),
         "--platform", "cpu"],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, f"\nstdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "carry contract holds" in r.stdout
