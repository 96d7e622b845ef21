"""Hypothesis fuzz: engine-level invariants that must hold for ANY input
(the RandomizedTesting spirit of the reference's test framework)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.analysis.lowercase import simple_lowercase
from lucene_ray.analysis.tokenizer import StandardTokenizer
from lucene_ray.codecs.smallfloat import encode_norms
from lucene_ray.index.segment import (
    decode_uint_blocks,
    encode_uint_blocks,
    encode_uint_blocks_batch,
    invert_texts,
)


class TestTokenizerFuzz:
    @given(st.text(max_size=400))
    @settings(max_examples=300, deadline=None)
    def test_never_crashes_and_offsets_sane(self, text):
        toks = StandardTokenizer().tokenize(text)
        prev_end = 0
        for t in toks:
            assert 0 <= t.start < t.end <= len(text)
            assert t.start >= prev_end or t.start >= 0  # non-overlapping order
            assert len(t.text) == t.end - t.start or not text.isascii()
            prev_end = t.end if t.end > prev_end else prev_end

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_terms_matches_tokenize(self, text):
        tk = StandardTokenizer()
        assert tk.terms(text) == [t.text for t in tk.tokenize(text)]

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_lowercase_idempotent_length_preserving(self, text):
        low = simple_lowercase(text)
        assert len(low) == len(text)
        assert simple_lowercase(low) == low

    @given(st.text(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_analyze_fast_consistent(self, text):
        a = Analyzer(stopwords={"the", "a"})
        full = a.analyze(text)
        terms, positions = a.analyze_fast(text)
        assert terms == [t[0] for t in full]


class TestInversionFuzz:
    @given(
        st.lists(
            st.text(alphabet="ab c", max_size=30), min_size=1, max_size=20
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_invert_roundtrip_counts(self, texts):
        a = Analyzer()
        inv = invert_texts(texts, a, with_positions=True)
        # total pairs tf sum == total tokens == doc_lengths sum
        assert int(inv.pair_tfs.sum()) == int(inv.doc_lengths.sum())
        # per-term docids strictly increasing
        for ti in range(len(inv.terms)):
            s, e = inv.term_starts[ti], inv.term_starts[ti + 1]
            d = inv.pair_docids[s:e].astype(np.int64)
            assert (np.diff(d) > 0).all()
        # positions align with tfs
        if inv.positions is not None and len(inv.terms):
            assert inv.pos_starts[-1] == len(inv.positions)

    @given(st.lists(st.integers(0, 2**20), min_size=0, max_size=700))
    @settings(max_examples=100, deadline=None)
    def test_uint_blocks_roundtrip(self, vals):
        v = np.array(vals, dtype=np.uint32)
        assert list(decode_uint_blocks(encode_uint_blocks(v))) == vals

    @given(
        st.lists(
            st.lists(st.integers(0, 2**18), max_size=300),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_uint_blocks_batch_matches_scalar(self, runs):
        flat = np.array([x for r in runs for x in r], dtype=np.uint32)
        starts = np.cumsum([0] + [len(r) for r in runs]).astype(np.int64)
        batch = encode_uint_blocks_batch(flat, starts)
        for i, r in enumerate(runs):
            assert list(decode_uint_blocks(batch[i])) == r
