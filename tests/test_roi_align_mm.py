"""Matmul-form RoIAlign must match the gather-form (and hence the torchvision
reference semantics) to float tolerance."""
import numpy as np
import jax.numpy as jnp

from slowfast_vos_tpu.ops.roi_align import multiscale_roi_align
from slowfast_vos_tpu.ops.roi_align_mm import multiscale_roi_align_mm


def test_mm_matches_gather_form():
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(64, 96, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(32, 48, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(16, 24, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(8, 12, 8)).astype(np.float32)),
    ]
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    xy = rng.uniform(-20, 300, (37, 2))
    wh = rng.uniform(2, 400, (37, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))

    want = np.asarray(multiscale_roi_align(feats, rois, scales, output_size=7))
    got = np.asarray(
        multiscale_roi_align_mm(feats, rois, scales, output_size=7, roi_block=16)
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mm_mask_size():
    rng = np.random.default_rng(1)
    feats = [jnp.asarray(rng.normal(size=(2 ** (6 - i), 2 ** (6 - i), 4)).astype(np.float32)) for i in range(4)]
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    rois = jnp.asarray(np.array([[4, 4, 60, 60], [0, 0, 200, 200]], np.float32))
    want = np.asarray(multiscale_roi_align(feats, rois, scales, output_size=14))
    got = np.asarray(multiscale_roi_align_mm(feats, rois, scales, output_size=14, roi_block=8))
    np.testing.assert_allclose(got, want, atol=2e-4)
