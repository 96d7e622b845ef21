"""LRUQueryCache: constant-score match-set caching for range and
multi-term queries, LRU eviction, deletes applied after cache lookup."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.deletes import delete_by_keys
from lucene_ray.search.query import PrefixQuery, RangeQuery, parse_query
from lucene_ray.search.querycache import LRUQueryCache
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

CFG = IndexConfig(
    rows_per_segment=150,
    keyword_cols=("lang",),
    dv_cols=("n_chars",),
)


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qcidx"))
    build_index(DOCS, d, CFG)
    return d


def searcher_with_cache(idx):
    return IndexSearcher(
        idx, query_cache=LRUQueryCache(max_entries=8, min_segment_docs=0)
    )


class TestCaching:
    def test_range_hit_and_identical_results(self, idx):
        s = searcher_with_cache(idx)
        q = "data #n_chars:[100 TO 300]"
        a = s.search(q, k=10**9, mode="exhaustive")
        misses0 = s.query_cache.misses
        assert misses0 > 0 and s.query_cache.hits == 0
        b = s.search(q, k=10**9, mode="exhaustive")
        assert s.query_cache.hits >= len(s.segments)
        assert s.query_cache.misses == misses0  # no new misses
        assert list(a["docids"]) == list(b["docids"])
        assert np.array_equal(a["scores"], b["scores"])

    def test_multiterm_cached(self, idx):
        s = searcher_with_cache(idx)
        r1 = s.search("st*", k=10**9, mode="exhaustive")
        r2 = s.search("st*", k=10**9, mode="exhaustive")
        assert s.query_cache.hits >= len(s.segments)
        assert list(r1["docids"]) == list(r2["docids"])

    def test_results_match_uncached(self, idx):
        cached = searcher_with_cache(idx)
        plain = IndexSearcher(idx, query_cache=None)
        for q in ["s?an data", "fuzzy~1", "#n_chars:[150 TO *] the"]:
            a = cached.search(q, k=10**9, mode="exhaustive")
            a = cached.search(q, k=10**9, mode="exhaustive")  # 2nd = from cache
            b = plain.search(q, k=10**9, mode="exhaustive")
            assert list(a["docids"]) == list(b["docids"]), q
            assert np.array_equal(a["scores"], b["scores"]), q

    def test_lru_eviction(self, idx):
        s = searcher_with_cache(idx)  # max_entries=8
        for lo in range(0, 120, 10):
            s.search(f"#n_chars:[{lo} TO *]", k=5, mode="exhaustive")
        assert len(s.query_cache) <= 8

    def test_min_segment_docs_skips_small_leaves(self, idx):
        s = IndexSearcher(
            idx, query_cache=LRUQueryCache(min_segment_docs=10_000)
        )
        s.search("#n_chars:[100 TO 300] data", k=5, mode="exhaustive")
        assert len(s.query_cache) == 0  # 150-doc segments all below threshold

    def test_boost_differs_key(self, idx):
        s = searcher_with_cache(idx)
        qa = RangeQuery(field="n_chars", lo=100, hi=300)
        qb = RangeQuery(field="n_chars", lo=100, hi=300, boost=2.0)
        assert LRUQueryCache.cache_key(qa) != LRUQueryCache.cache_key(qb)


class TestDeletesAfterCache:
    def test_deletes_applied_on_cached_path(self, ray_session, tmp_path):
        d = str(tmp_path / "qcdel")
        build_index(DOCS, d, CFG)
        s = searcher_with_cache(d)
        before = s.search("st*", k=10**9, mode="exhaustive")
        victims = [int(k) for k in before["keys"][:3]]
        delete_by_keys(d, victims)
        # fresh searcher (new reader generation) with a warm shared cache
        s2 = IndexSearcher(d, query_cache=s.query_cache)
        after = s2.search("st*", k=10**9, mode="exhaustive")
        assert not set(victims) & set(after["keys"])
        assert len(after["keys"]) == len(before["keys"]) - 3
