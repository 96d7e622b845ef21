"""Postings codec round-trip oracle — RandomPostingsTester-style
(``lucene/test-framework/.../index/RandomPostingsTester.java:90,694``):
random corpora round-trip exactly; impact frontiers dominate every
(freq, norm) in their block; block-boundary df cases covered.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.codecs.forutil import (
    bit_width,
    pack,
    pfor_decode,
    pfor_encode,
    unpack,
)
from lucene_ray.codecs.postings import (
    BLOCK_SIZE,
    PostingsView,
    competitive_impacts,
    encode_postings,
    max_block_score,
)
from lucene_ray.codecs.smallfloat import LENGTH_TABLE
from lucene_ray.search.bm25 import BM25Similarity


class TestForUtil:
    @given(
        st.lists(st.integers(0, 2**20 - 1), min_size=1, max_size=300),
        st.integers(20, 32),
    )
    @settings(max_examples=100)
    def test_pack_roundtrip(self, vals, width):
        v = np.array(vals, dtype=np.uint32)
        assert list(unpack(np.frombuffer(pack(v, width), np.uint8), len(v), width)) == vals

    def test_width_zero(self):
        assert pack(np.zeros(5, np.uint32), 0) == b""
        assert list(unpack(b"", 5, 0)) == [0] * 5

    @given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=256))
    @settings(max_examples=100)
    def test_pfor_roundtrip(self, vals):
        v = np.array(vals, dtype=np.uint32)
        w, buf, pos, ev = pfor_encode(v)
        got = pfor_decode(np.frombuffer(buf, np.uint8) if buf else b"", len(v), w, pos, ev)
        assert list(got) == vals
        assert len(pos) <= 7

    def test_pfor_outliers_dont_inflate_width(self):
        v = np.array([1] * 250 + [2**30] * 6, dtype=np.uint32)
        w, _, pos, _ = pfor_encode(v)
        assert w == 1 and len(pos) == 6


def _random_postings(rng, n, max_doc=None, dense=False):
    max_doc = max_doc or max(n * 20, n + 1)
    if dense:
        ids = np.arange(n, dtype=np.uint32) + rng.integers(0, 5)
    else:
        ids = np.sort(rng.choice(max_doc, size=n, replace=False)).astype(np.uint32)
    freqs = (rng.zipf(1.5, n).clip(1, 2**20)).astype(np.uint32)
    norms = rng.integers(0, 256, n).astype(np.uint8)
    return ids, freqs, norms


class TestPostingsBlob:
    @pytest.mark.parametrize("df", [1, 2, 255, 256, 257, 511, 512, 513, 8192])
    def test_roundtrip_block_boundaries(self, df):
        rng = np.random.default_rng(df)
        ids, freqs, norms = _random_postings(rng, df)
        blob = encode_postings(ids, freqs, norms)
        view = PostingsView(blob)
        got_ids, got_freqs = view.decode_all()
        assert (got_ids == ids).all()
        assert (got_freqs == freqs).all()
        assert view.doc_count == df

    def test_dense_block_uses_bitset(self):
        # consecutive docids: bitset (256 bits = 32B) beats FOR (256*1b = 32B
        # tie → FOR) unless gaps are 0-width... sparse freqs force decision
        ids = np.arange(1000, 1256, dtype=np.uint32)  # perfectly dense
        freqs = np.ones(256, np.uint32)
        blob = encode_postings(ids, freqs, np.full(256, 40, np.uint8))
        view = PostingsView(blob)
        got_ids, got_freqs = view.decode_all()
        assert (got_ids == ids).all() and (got_freqs == freqs).all()

    def test_very_sparse_uses_for(self):
        rng = np.random.default_rng(7)
        ids, freqs, norms = _random_postings(rng, 300, max_doc=10**8)
        view = PostingsView(encode_postings(ids, freqs, norms))
        assert view.directory[0]["docid_kind"] == 0
        got_ids, _ = view.decode_all()
        assert (got_ids == ids).all()

    @given(st.integers(0, 2**32 - 1), st.integers(1, 600))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_random(self, seed, df):
        rng = np.random.default_rng(seed)
        ids, freqs, norms = _random_postings(rng, df, dense=bool(seed % 3 == 0))
        view = PostingsView(encode_postings(ids, freqs, norms))
        got_ids, got_freqs = view.decode_all()
        assert (got_ids == ids).all() and (got_freqs == freqs).all()

    def test_single_block_decode(self):
        rng = np.random.default_rng(3)
        ids, freqs, norms = _random_postings(rng, 600)
        view = PostingsView(encode_postings(ids, freqs, norms))
        i0, f0 = view.decode_block(0)
        i1, f1 = view.decode_block(1)
        i2, f2 = view.decode_block(2)
        assert (np.concatenate([i0, i1, i2]) == ids).all()
        assert len(i2) == 600 - 512

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            encode_postings(np.empty(0, np.uint32), np.empty(0, np.uint32))


class TestImpacts:
    def test_frontier_is_pareto(self):
        freqs = np.array([3, 10, 2, 10, 7], np.uint32)
        norms = np.array([50, 60, 40, 80, 60], np.uint8)
        fr = competitive_impacts(freqs, norms)
        # norm 40 → max 2; norm 50 → 3 (>2 keep); norm 60 → 10 (keep);
        # norm 80 → 10 not > 10 → dominated
        assert [(int(f), int(n)) for f, n in fr] == [(2, 40), (3, 50), (10, 60)]

    @given(st.integers(0, 10**6), st.integers(1, 400))
    @settings(max_examples=50, deadline=None)
    def test_impacts_dominate_block(self, seed, df):
        rng = np.random.default_rng(seed)
        ids, freqs, norms = _random_postings(rng, df)
        view = PostingsView(encode_postings(ids, freqs, norms))
        sc = BM25Similarity().scorer(1.0, 10000, 500000, int(df))
        for bi in range(view.n_blocks):
            imp = view.impacts(bi)
            bound = max_block_score(imp, sc)
            bids, bfreqs = view.decode_block(bi)
            lo = bi * BLOCK_SIZE
            real = sc.score(
                bfreqs.astype(np.float32), norms[lo : lo + len(bids)]
            )
            assert (real <= bound + 1e-6).all()

    def test_max_block_score_no_impacts_falls_back_to_weight(self):
        sc = BM25Similarity().scorer(1.0, 100, 5000, 10)
        assert max_block_score(np.zeros(0, dtype=[("freq", "<u4"), ("norm", "u1")]), sc) == pytest.approx(
            float(sc.weight)
        )
