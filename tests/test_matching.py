import jax
import jax.numpy as jnp
import numpy as np

from slowfast_vos_tpu.models.matching import (
    match_to_gt,
    sample_balanced,
    sample_balanced_indices,
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


def _compact_as_sets(key, positive, negative, **kw):
    idx, is_pos, valid = sample_balanced_indices(
        key, jnp.asarray(positive), jnp.asarray(negative), **kw
    )
    idx, is_pos, valid = np.asarray(idx), np.asarray(is_pos), np.asarray(valid)
    return idx[valid & is_pos], idx[valid & ~is_pos]


def test_compact_sampler_counts_and_purity():
    rng = np.random.default_rng(0)
    positive = rng.uniform(size=500) < 0.1
    between = (~positive) & (rng.uniform(size=500) < 0.05)
    negative = ~positive & ~between
    pos_idx, neg_idx = _compact_as_sets(
        jax.random.PRNGKey(1), positive, negative,
        batch_size=256, positive_fraction=0.5,
    )
    assert len(pos_idx) == min(128, positive.sum())
    assert len(pos_idx) + len(neg_idx) == 256
    # purity: every sampled index really is of its class (in particular no
    # BETWEEN anchor is ever sampled)
    assert positive[pos_idx].all()
    assert negative[neg_idx].all()
    # no duplicates among valid samples
    both = np.concatenate([pos_idx, neg_idx])
    assert len(np.unique(both)) == len(both)


def test_compact_sampler_few_negatives():
    pos_idx, neg_idx = _compact_as_sets(
        jax.random.PRNGKey(0), np.ones(300, bool), np.zeros(300, bool),
        batch_size=256, positive_fraction=0.25,
    )
    assert len(pos_idx) == 64 and len(neg_idx) == 0


def test_compact_sampler_no_positives():
    pos_idx, neg_idx = _compact_as_sets(
        jax.random.PRNGKey(0), np.zeros(300, bool), np.ones(300, bool),
        batch_size=256, positive_fraction=0.5,
    )
    assert len(pos_idx) == 0 and len(neg_idx) == 256


def test_compact_sampler_n_smaller_than_batch():
    rng = np.random.default_rng(3)
    positive = rng.uniform(size=100) < 0.3
    negative = ~positive
    pos_idx, neg_idx = _compact_as_sets(
        jax.random.PRNGKey(2), positive, negative,
        batch_size=256, positive_fraction=0.5,
    )
    assert len(pos_idx) == positive.sum()
    assert len(neg_idx) == negative.sum()
    assert negative[neg_idx].all()


def test_compact_sampler_marginals_match_mask_form():
    """Both samplers draw a uniform random subset per class: each eligible
    anchor's inclusion frequency over many keys must match between the two
    forms (binomial tolerance)."""
    rng = np.random.default_rng(7)
    positive = rng.uniform(size=60) < 0.25
    negative = ~positive & (rng.uniform(size=60) < 0.8)
    kw = dict(batch_size=16, positive_fraction=0.5)
    n_keys = 400
    freq_mask = np.zeros(60)
    freq_cmp = np.zeros(60)
    for i in range(n_keys):
        pm, nm = sample_balanced(
            jax.random.PRNGKey(i), jnp.asarray(positive), jnp.asarray(negative), **kw
        )
        freq_mask += np.asarray(pm | nm)
        pi, ni = _compact_as_sets(jax.random.PRNGKey(10_000 + i), positive, negative, **kw)
        freq_cmp[pi] += 1
        freq_cmp[ni] += 1
    # per-class uniform => within a class all eligible anchors share one
    # expected frequency; compare class means and per-anchor deviations
    for cls in (positive, np.asarray(negative)):
        m, c = freq_mask[cls] / n_keys, freq_cmp[cls] / n_keys
        np.testing.assert_allclose(m.mean(), c.mean(), atol=0.05)
        assert np.abs(m - m.mean()).max() < 0.12
        assert np.abs(c - c.mean()).max() < 0.12
