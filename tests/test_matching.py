import jax
import jax.numpy as jnp
import numpy as np

from slowfast_vos_tpu.models.matching import (
    match_to_gt,
    sample_balanced,
    BELOW_LOW,
    BETWEEN,
)


def test_matcher_thresholds():
    iou = jnp.array(
        [
            [0.8, 0.1],   # clear fg of gt0
            [0.4, 0.5],   # between -> BETWEEN
            [0.1, 0.2],   # below -> BELOW_LOW
        ]
    )
    m = match_to_gt(iou, jnp.array([True, True]), high_threshold=0.7, low_threshold=0.3, allow_low_quality=False)
    np.testing.assert_array_equal(np.asarray(m), [0, BETWEEN, BELOW_LOW])


def test_matcher_low_quality_restores_best_anchor():
    # gt1's best anchor has IoU 0.2 (below low) but must be restored.
    iou = jnp.array(
        [
            [0.8, 0.05],
            [0.0, 0.2],
        ]
    )
    m = match_to_gt(iou, jnp.array([True, True]), high_threshold=0.7, low_threshold=0.3, allow_low_quality=True)
    np.testing.assert_array_equal(np.asarray(m), [0, 1])


def test_matcher_ignores_invalid_gt():
    iou = jnp.array([[0.1, 0.9]])
    m = match_to_gt(iou, jnp.array([True, False]), high_threshold=0.7, low_threshold=0.3, allow_low_quality=False)
    assert int(m[0]) == BELOW_LOW


def test_sampler_counts_and_disjoint():
    rng = np.random.default_rng(0)
    positive = jnp.asarray(rng.uniform(size=500) < 0.1)
    negative = ~positive
    pos, neg = sample_balanced(
        jax.random.PRNGKey(1), positive, negative, batch_size=256, positive_fraction=0.5
    )
    pos, neg = np.asarray(pos), np.asarray(neg)
    assert pos.sum() == min(128, positive.sum())
    assert pos.sum() + neg.sum() == 256
    assert not (pos & neg).any()
    assert (pos <= np.asarray(positive)).all()
    assert (neg <= np.asarray(negative)).all()


def test_sampler_few_negatives():
    positive = jnp.asarray(np.ones(300, bool))
    negative = jnp.asarray(np.zeros(300, bool))
    pos, neg = sample_balanced(
        jax.random.PRNGKey(0), positive, negative, batch_size=256, positive_fraction=0.25
    )
    assert np.asarray(pos).sum() == 64
    assert np.asarray(neg).sum() == 0
