"""Pallas RoIAlign kernel parity (interpret mode on CPU) against the gather
formulation, at realistic DAVIS pyramid geometry."""
import numpy as np
import jax.numpy as jnp
import pytest

from slowfast_vos_tpu.ops.roi_align import multiscale_roi_align
from slowfast_vos_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas


@pytest.mark.parametrize("out_size", [7, 14])
def test_pallas_matches_gather(out_size):
    rng = np.random.default_rng(0)
    # DAVIS-like pyramid at 1/4 linear scale to keep interpret mode fast
    feats = [
        jnp.asarray(rng.normal(size=(192 // s, 336 // s, 8)).astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    xy = rng.uniform(-10, 300, (24, 2))
    wh = rng.uniform(4, 120, (24, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))

    want = np.asarray(multiscale_roi_align(feats, rois, scales, output_size=out_size))
    got = np.asarray(
        multiscale_roi_align_pallas(
            feats, rois, scales, output_size=out_size, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
