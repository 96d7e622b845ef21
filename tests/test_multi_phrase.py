"""MultiPhraseQuery: per-slot union semantics
(``core/search/MultiPhraseQuery.java``) — match set must equal the union
of all concrete phrase expansions; degenerate forms must rewrite exactly
as the reference does (:182-194)."""

import itertools

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.query import (
    SHOULD,
    BooleanQuery,
    MultiPhraseQuery,
    PhraseQuery,
    TermQuery,
    rewrite,
)
from lucene_ray.search.searcher import IndexSearcher, localize_query

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mp"))
    build_index(
        DOCS, d, IndexConfig(rows_per_segment=200, num_buckets=2, positions=True)
    )
    return IndexSearcher(d)


SPECS = [
    (("batch", "data"), ("stream",)),
    (("merge",), ("sort", "join")),
    (("data", "the"), ("data", "window")),
    (("spark", "zzzabsent"), ("merge",)),  # absent alternative ignored
    (("zzzabsent",), ("merge",)),  # dead slot → no matches
]


class TestMultiPhrase:
    @pytest.mark.parametrize("spec", SPECS)
    def test_match_set_is_expansion_union(self, searcher, spec):
        got = searcher.search(
            MultiPhraseQuery(positions=spec), k=10**6, mode="exhaustive"
        )
        want = set()
        for combo in itertools.product(*spec):
            r = searcher.search(PhraseQuery(combo), k=10**6, mode="exhaustive")
            want |= set(r["docids"])
        assert set(got["docids"]) == want

    @pytest.mark.parametrize("spec", SPECS[:3])
    def test_sloppy_superset_of_exact(self, searcher, spec):
        exact = searcher.search(
            MultiPhraseQuery(positions=spec), k=10**6, mode="exhaustive"
        )
        sloppy = searcher.search(
            MultiPhraseQuery(positions=spec, slop=2), k=10**6, mode="exhaustive"
        )
        assert set(exact["docids"]) <= set(sloppy["docids"])

    def test_single_slot_rewrites_to_should(self, searcher):
        mp = searcher.search(
            MultiPhraseQuery(positions=(("batch", "data"),)),
            k=50,
            mode="exhaustive",
        )
        bq = searcher.search(
            BooleanQuery(
                ((SHOULD, TermQuery("batch")), (SHOULD, TermQuery("data")))
            ),
            k=50,
            mode="exhaustive",
        )
        assert list(mp["docids"]) == list(bq["docids"])
        assert np.array_equal(mp["scores"], bq["scores"])

    def test_singleton_slots_equal_phrase(self, searcher):
        mp = searcher.search(
            MultiPhraseQuery(positions=(("batch",), ("stream",))),
            k=10**6,
            mode="exhaustive",
        )
        ph = searcher.search(
            PhraseQuery(("batch", "stream")), k=10**6, mode="exhaustive"
        )
        assert list(mp["docids"]) == list(ph["docids"])
        assert np.array_equal(mp["scores"], ph["scores"])

    def test_rewrite_forms(self):
        assert rewrite(MultiPhraseQuery(positions=())) == BooleanQuery(())
        r1 = rewrite(MultiPhraseQuery(positions=(("a", "b"),)))
        assert isinstance(r1, BooleanQuery)
        assert {s.term for _, s in r1.clauses} == {"a", "b"}
        r2 = rewrite(MultiPhraseQuery(positions=(("a",), ("b",)), slop=1))
        assert r2 == PhraseQuery(("a", "b"), 1, 1.0)

    def test_idf_sums_only_present_terms(self, searcher):
        """An absent alternative must not change the score (df=0 terms
        are skipped in getStats, MultiPhraseQuery.java:228)."""
        base = searcher.search(
            MultiPhraseQuery(positions=(("batch",), ("stream",))),
            k=10**6,
            mode="exhaustive",
        )
        padded = searcher.search(
            MultiPhraseQuery(positions=(("batch", "zzzabsent"), ("stream",))),
            k=10**6,
            mode="exhaustive",
        )
        assert list(base["docids"]) == list(padded["docids"])
        assert np.array_equal(base["scores"], padded["scores"])

    def test_localize_roundtrip(self):
        q = MultiPhraseQuery(positions=(("a", "b"), ("c",)), slop=1, boost=2.0)
        assert localize_query(q) == q
