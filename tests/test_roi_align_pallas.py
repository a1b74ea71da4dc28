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
    extra = np.array(
        [
            [0.0, 0.0, 1.5, 1.5],        # sub-pixel box
            [330.0, 188.0, 345.0, 200.0],  # past the bottom-right edge
            [50.0, 50.0, 50.0, 50.0],    # degenerate (zero area)
            [10.0, 80.0, 190.0, 125.0],  # 4:1 aspect -> full 56px tier, no fallback
            [-20.0, -20.0, 4.0, 4.0],    # mostly off-canvas
        ],
        np.float32,
    )
    rois = jnp.asarray(
        np.concatenate([np.concatenate([xy, xy + wh], 1).astype(np.float32), extra])
    )

    # The size-tier machinery must actually be exercised: this roi set spans
    # every DMA tier (small/medium/full patch).
    spans = np.asarray(rois[:, 2:] - rois[:, :2]).max(1)
    assert (spans < 16).any() and (spans > 150).any()

    want = np.asarray(multiscale_roi_align(feats, rois, scales, output_size=out_size))
    got = np.asarray(
        multiscale_roi_align_pallas(
            feats, rois, scales, output_size=out_size, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pallas_clip_matches_per_frame():
    """The whole-clip kernel (one pallas_call over [T, N] rois with a frame
    column) must equal per-frame gather pooling exactly — frames must not
    bleed into each other, and the N-not-multiple-of-4 padding must slice
    off cleanly."""
    from slowfast_vos_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas_clip

    rng = np.random.default_rng(1)
    t, n = 3, 29  # n deliberately not a ROIS_PER_PROGRAM multiple
    feats = [
        jnp.asarray(rng.normal(size=(t, 192 // s, 336 // s, 8)).astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    scales = (1 / 4, 1 / 8, 1 / 16, 1 / 32)
    xy = rng.uniform(-10, 300, (t, n, 2))
    wh = rng.uniform(4, 150, (t, n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))

    got = np.asarray(
        multiscale_roi_align_pallas_clip(feats, rois, scales, output_size=7, interpret=True)
    )
    assert got.shape == (t, n, 7, 7, 8)
    for f in range(t):
        want = np.asarray(
            multiscale_roi_align([fl[f] for fl in feats], rois[f], scales, output_size=7)
        )
        np.testing.assert_allclose(got[f], want, atol=2e-4, err_msg=f"frame {f}")
