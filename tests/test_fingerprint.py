"""Winnowing fingerprints: guarantee property, ties, edges."""

import numpy as np

from lucene_ray.pipelines.fingerprint import K, W, winnow


def test_short_text_no_fingerprints():
    assert len(winnow("")) == 0
    assert len(winnow("x" * (K + W - 2))) == 0  # n_grams = W-1 < W


def test_deterministic():
    t = "the quick brown fox jumps over the lazy dog" * 3
    a, b = winnow(t), winnow(t)
    assert np.array_equal(a, b)


def test_positions_valid_and_unique():
    t = "abcdefghijabcdefghijabcdefghij"
    m = winnow(t)
    assert len(m) > 0
    assert (m[:, 0] >= 0).all() and (m[:, 0] <= len(t) - K).all()
    # (pos, fp) pairs are deduplicated
    assert len(np.unique(m, axis=0)) == len(m)


def test_winnowing_guarantee():
    """Any shared substring of length >= W + K - 1 must produce at least
    one shared fingerprint hash (the winnowing theorem)."""
    rng = np.random.default_rng(3)
    alpha = "abcdefgh"
    frag = "".join(rng.choice(list(alpha), W + K - 1))
    for _ in range(10):
        pre = "".join(rng.choice(list(alpha), 30))
        post = "".join(rng.choice(list(alpha), 30))
        a = winnow(pre + frag + post)
        b = winnow(frag)
        assert len(b) > 0
        assert set(b[:, 1]) & set(a[:, 1]), "guarantee violated"


def test_rightmost_tie_selection():
    # constant text → every k-gram hash identical → each window selects
    # its rightmost position; dedupe leaves one fingerprint per window end
    t = "a" * (K + W + 3)  # n_grams = W + 4
    m = winnow(t)
    n_grams = len(t) - K + 1
    want_pos = np.arange(W - 1, n_grams)
    assert np.array_equal(np.sort(m[:, 0]), want_pos)
    assert len(set(m[:, 1])) == 1
