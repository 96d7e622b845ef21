"""Exact sloppy-phrase semantics (SloppyPhraseMatcher reimplementation):
hand-traced goldens from the reference's documented behavior + property
checks against brute force for the 2-term match set."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.search.sloppy import SloppyPhraseMatcher, sloppy_phrase_freq


def _pos(tokens, term):
    return np.array([i for i, t in enumerate(tokens) if t == term], np.int64)


def freq_of(doc: str, phrase: str, slop: int) -> float:
    tokens = doc.split()
    terms = phrase.split()
    lists = [_pos(tokens, t) for t in terms]
    if any(len(p) == 0 for p in lists):
        return 0.0
    return float(sloppy_phrase_freq(terms, lists, slop))


class TestGoldens:
    def test_javadoc_example_two_matches(self):
        # reference javadoc: "a b"~2 on "x a b a y" matches twice —
        # "a b" (matchLength 0) and "b a" (matchLength 2)
        f = freq_of("x a b a y", "a b", 2)
        assert f == pytest.approx(1.0 + 1.0 / 3.0, abs=1e-6)

    def test_javadoc_asymmetry(self):
        # "a b c b a" scores differently for "a b c"~4 vs "c b a"~4
        # (greedy least-position propagation — documented reference
        # behavior). Hand-traced: 1 + 1/5 + 1/5 = 1.4 vs 1/5 + 1 = 1.2
        # (for "c b a": first match at length 4, then b minimizes to an
        # exact "c b a"-aligned window of length 0 before exhausting).
        f1 = freq_of("a b c b a", "a b c", 4)
        f2 = freq_of("a b c b a", "c b a", 4)
        assert f1 == pytest.approx(1.4, abs=1e-6)
        assert f2 == pytest.approx(1.2, abs=1e-6)

    def test_exact_match_weight_one(self):
        assert freq_of("a b c", "a b", 0) == 1.0
        assert freq_of("a b a b", "a b", 0) == 2.0

    def test_no_match_beyond_slop(self):
        assert freq_of("a x x x b", "a b", 2) == 0.0
        assert freq_of("a x x x b", "a b", 3) == pytest.approx(0.25)

    def test_repeat_group(self):
        # "data x data" vs "data data"~2: repeat-group init advances the
        # second pp; single match at matchLength 1 → freq 1/2
        assert freq_of("data x data", "data data", 2) == pytest.approx(0.5)

    def test_repeat_adjacent(self):
        assert freq_of("data data", "data data", 0) == 1.0


class TestTwoTermMatchSetProperty:
    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.sampled_from("abx"), min_size=2, max_size=12),
           st.integers(min_value=0, max_value=4))
    def test_match_iff_pair_within_slop(self, tokens, slop):
        """For a 2-distinct-term phrase, freq > 0 ⟺ some (pa, pb) with
        |(pb − 1) − pa| ≤ slop — the SQL-expressible oracle condition."""
        doc = " ".join(tokens)
        pa_ = _pos(tokens, "a")
        pb = _pos(tokens, "b")
        if len(pa_) == 0 or len(pb) == 0:
            return
        want = any(abs((int(y) - 1) - int(x)) <= slop for x in pa_ for y in pb)
        got = freq_of(doc, "a b", slop) > 0
        assert got == want

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from("ab"), min_size=2, max_size=10))
    def test_slop_monotone(self, tokens):
        doc = " ".join(tokens)
        if "a" not in tokens or "b" not in tokens:
            return
        freqs = [freq_of(doc, "a b", s) for s in range(5)]
        # match set only grows with slop
        for lo, hi in zip(freqs, freqs[1:]):
            assert (hi > 0) >= (lo > 0)


class TestEndToEnd:
    def test_sloppy_through_searcher(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig
        from lucene_ray.search.searcher import IndexSearcher

        docs = tmp_path / "docs.parquet"
        texts = [
            "x a b a y",        # freq 4/3 at slop 2
            "a q q b",          # gap 2 → matches at slop >= 2
            "b a",              # reversed, distance 2
            "a b",              # exact
            "no terms here",
        ]
        pq.write_table(
            pa.table({"doc_id": list(range(len(texts))), "text": texts}),
            str(docs),
        )
        d = str(tmp_path / "idx")
        build_index(str(docs), d, IndexConfig(rows_per_segment=2))
        s = IndexSearcher(d)
        r = s.search('"a b"~2', k=10)
        got = dict(zip(r["keys"], r["scores"]))
        assert set(got) == {0, 1, 2, 3}
        # doc 0 has the highest sloppy freq (two matches) of the
        # len-5 docs; doc 3 (len 2, exact) outranks on norms
        r0 = s.search('"a b"~0', k=10)
        assert set(r0["keys"]) == {0, 3}
