import jax
import jax.numpy as jnp
import numpy as np

from da_detect_tpu.ops.matcher import (BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS,
                                       match_proposals)
from da_detect_tpu.ops.sampler import balanced_sample, selection_to_indices


def np_matcher(quality_gn, high, low, allow_low_quality):
    """Clean-room oracle in the reference's [G, N] orientation
    (modeling/matcher.py semantics)."""
    g, n = quality_gn.shape
    matched_vals = quality_gn.max(0)
    matches = quality_gn.argmax(0)
    all_matches = matches.copy()
    out = matches.copy()
    out[matched_vals < low] = BELOW_LOW_THRESHOLD
    out[(matched_vals >= low) & (matched_vals < high)] = BETWEEN_THRESHOLDS
    if allow_low_quality:
        best_per_gt = quality_gn.max(1)
        for gi in range(g):
            if best_per_gt[gi] <= 0:
                continue
            for ni in range(n):
                if quality_gn[gi, ni] == best_per_gt[gi]:
                    out[ni] = all_matches[ni]
    return out


def test_matcher_matches_oracle():
    rng = np.random.RandomState(0)
    for allow in (False, True):
        for seed in range(3):
            rng = np.random.RandomState(seed)
            q = rng.uniform(0, 1, (5, 40)).astype(np.float32)
            # sprinkle exact zeros and sub-threshold rows
            q[:, :10] *= 0.2
            want = np_matcher(q, 0.7, 0.3, allow)
            got = np.asarray(match_proposals(jnp.asarray(q.T), jnp.ones(5, bool),
                                             0.7, 0.3, allow))
            np.testing.assert_array_equal(got, want)


def test_matcher_gt_padding():
    rng = np.random.RandomState(1)
    q = rng.uniform(0, 1, (5, 30)).astype(np.float32)
    gt_valid = np.array([True, True, False, False, False])
    got = np.asarray(match_proposals(jnp.asarray(q.T), jnp.asarray(gt_valid),
                                     0.7, 0.3, True))
    want = np_matcher(q[:2], 0.7, 0.3, True)
    np.testing.assert_array_equal(got, want)
    # no valid gt at all -> all background
    got0 = np.asarray(match_proposals(jnp.asarray(q.T), jnp.zeros(5, bool),
                                      0.7, 0.3, True))
    assert np.all(got0 == BELOW_LOW_THRESHOLD)


def test_balanced_sample_counts():
    rng = np.random.RandomState(2)
    labels = jnp.asarray(rng.choice([-1, 0, 1], size=500, p=[0.3, 0.6, 0.1]))
    key = jax.random.PRNGKey(0)
    pos, neg = balanced_sample(key, labels, 256, 0.5)
    pos, neg = np.asarray(pos), np.asarray(neg)
    lab = np.asarray(labels)
    assert pos.sum() == min((lab == 1).sum(), 128)
    assert neg.sum() == min((lab == 0).sum(), 256 - pos.sum())
    assert np.all(lab[pos] == 1) and np.all(lab[neg] == 0)


def test_balanced_sample_few_positives():
    labels = jnp.asarray([1, 1] + [0] * 100 + [-1] * 20)
    pos, neg = balanced_sample(jax.random.PRNGKey(1), labels, 64, 0.25)
    assert int(pos.sum()) == 2
    assert int(neg.sum()) == 62


def test_balanced_sample_randomized():
    labels = jnp.asarray([0] * 400)
    sel1, _n1 = None, None
    s_a = np.asarray(balanced_sample(jax.random.PRNGKey(1), labels, 64, 0.5)[1])
    s_b = np.asarray(balanced_sample(jax.random.PRNGKey(2), labels, 64, 0.5)[1])
    assert s_a.sum() == s_b.sum() == 64
    assert not np.array_equal(s_a, s_b)  # different keys, different subsets


def test_selection_to_indices():
    pos = jnp.asarray([False, True, False, False, True, False])
    neg = jnp.asarray([True, False, False, True, False, False])
    idx, is_pos, valid = selection_to_indices(pos, neg, 6)
    idx, is_pos, valid = np.asarray(idx), np.asarray(is_pos), np.asarray(valid)
    assert valid.sum() == 4
    np.testing.assert_array_equal(idx[:2], [1, 4])      # positives first
    np.testing.assert_array_equal(np.sort(idx[2:4]), [0, 3])
    assert np.all(is_pos[:2]) and not np.any(is_pos[2:])


def test_balanced_sample_batched():
    rng = np.random.RandomState(3)
    labels = jnp.asarray(rng.choice([-1, 0, 1], size=(3, 200), p=[0.2, 0.7, 0.1]))
    pos, neg = balanced_sample(jax.random.PRNGKey(3), labels, 64, 0.5)
    assert pos.shape == (3, 200)
    lab = np.asarray(labels)
    for b in range(3):
        assert np.asarray(pos)[b].sum() == min((lab[b] == 1).sum(), 32)
