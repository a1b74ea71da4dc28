import numpy as np
import jax.numpy as jnp

from slowfast_vos_tpu.ops import roi_align, multiscale_roi_align
from slowfast_vos_tpu.ops.roi_align import fpn_level_assignment


def ref_bilinear(feat, y, x):
    """Scalar bilinear sample with torchvision roi_align border rules."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2])
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def ref_roi_align(feat, rois, scale, out_size, sr):
    n = len(rois)
    c = feat.shape[2]
    out = np.zeros((n, out_size, out_size, c))
    for i, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(c)
                for iy in range(sr):
                    yy = y1 + ph * bh + (iy + 0.5) * bh / sr
                    for ix in range(sr):
                        xx = x1 + pw * bw + (ix + 0.5) * bw / sr
                        acc += ref_bilinear(feat, yy, xx)
                out[i, ph, pw] = acc / (sr * sr)
    return out


def test_roi_align_matches_reference():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(24, 32, 3)).astype(np.float32)
    rois = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],
            [0.0, 0.0, 128.0, 96.0],
            [10.5, 3.25, 30.75, 77.0],
            [-8.0, -8.0, 20.0, 20.0],  # partially outside
            [100.0, 80.0, 140.0, 120.0],  # mostly outside
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, output_size=7, sampling_ratio=2))
    want = ref_roi_align(feat, rois, 0.25, 7, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fpn_level_assignment():
    # area 224^2 at canonical scale -> level k=4 -> index 2 (P4)
    rois = np.array(
        [
            [0, 0, 224, 224],
            [0, 0, 32, 32],      # tiny -> finest (index 0)
            [0, 0, 1000, 1000],  # huge -> coarsest (index 3)
        ],
        np.float32,
    )
    lv = np.asarray(fpn_level_assignment(jnp.asarray(rois)))
    np.testing.assert_array_equal(lv, [2, 0, 3])


def test_multiscale_roi_align_selects_per_level():
    rng = np.random.default_rng(1)
    feats = [
        jnp.asarray(rng.normal(size=(64, 64, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(32, 32, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(8, 8, 4)).astype(np.float32)),
    ]
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    rois = np.array([[0, 0, 32, 32], [0, 0, 224, 224]], np.float32)
    out = np.asarray(multiscale_roi_align(feats, jnp.asarray(rois), scales, output_size=7))
    # roi 0 assigned to level 0, roi 1 to level 2 — check against single-level calls
    lv = np.asarray(fpn_level_assignment(jnp.asarray(rois)))
    for i, l in enumerate(lv):
        single = np.asarray(
            roi_align(feats[l], jnp.asarray(rois[i : i + 1]), scales[l], output_size=7)
        )
        np.testing.assert_allclose(out[i], single[0], atol=1e-5)


def test_mmgrad_forward_and_gradient_match_gather_autodiff():
    """The custom-VJP pool (gather forward, separable-matmul backward —
    ops/roi_align_mm.py multiscale_roi_align_mmgrad) must match the plain
    gather form exactly in the forward AND its jax.grad in the feature
    gradient: pooling is one linear map, the matmul backward is its
    transpose. Rois cover all levels, fractional coords, partially/mostly
    out-of-range boxes and degenerate (sub-1px) boxes; roi-coordinate
    gradients are defined as 0 (torchvision parity)."""
    import jax

    from slowfast_vos_tpu.ops.roi_align_mm import multiscale_roi_align_mmgrad

    rng = np.random.default_rng(7)
    feats = [
        jnp.asarray(rng.normal(size=(64, 96, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(32, 48, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(8, 12, 8)).astype(np.float32)),
    ]
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    rois = jnp.asarray(
        np.array(
            [
                [4.0, 4.0, 60.5, 40.25],    # P2
                [0.0, 0.0, 150.0, 150.0],   # P3
                [0.0, 0.0, 250.0, 250.0],   # P4
                [-30.0, -30.0, 900.0, 700.0],  # clamps to P5, spills edges
                [-8.0, -8.0, 4.0, 4.0],     # partially outside
                [10.0, 10.0, 10.2, 10.2],   # sub-1px (floored to 1)
                [370.0, 250.0, 400.0, 280.0],  # fully outside the map
            ],
            np.float32,
        )
    )
    cot = jnp.asarray(rng.normal(size=(rois.shape[0], 7, 7, 8)).astype(np.float32))

    def pooled_sum(fn):
        def f(fs):
            out = fn(fs, rois, scales, output_size=7)
            return jnp.sum(out * cot)
        return f

    out_ref = multiscale_roi_align(feats, rois, scales, output_size=7)
    out_new = multiscale_roi_align_mmgrad(feats, rois, scales, output_size=7)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref), atol=1e-5)

    g_ref = jax.grad(pooled_sum(lambda fs, *a, **k: multiscale_roi_align(list(fs), *a, **k)))(tuple(feats))
    g_new = jax.grad(pooled_sum(multiscale_roi_align_mmgrad))(tuple(feats))
    for lr, ln in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(ln), np.asarray(lr), atol=1e-4)

    # vmap over a frame axis (the production use) keeps grads exact too.
    frois = jnp.stack([rois, rois[::-1]])
    fcot = jnp.stack([cot, cot + 1.0])
    ffeats = [jnp.stack([f, f * 0.5]) for f in feats]

    def batched(fn):
        def f(fs):
            out = jax.vmap(
                lambda l0, l1, l2, l3, r: fn([l0, l1, l2, l3], r, scales, output_size=7)
            )(*fs, frois)
            return jnp.sum(out * fcot)
        return f

    gb_ref = jax.grad(batched(lambda fs, *a, **k: multiscale_roi_align(list(fs), *a, **k)))(tuple(ffeats))
    gb_new = jax.grad(batched(multiscale_roi_align_mmgrad))(tuple(ffeats))
    for lr, ln in zip(gb_ref, gb_new):
        np.testing.assert_allclose(np.asarray(ln), np.asarray(lr), atol=1e-4)
