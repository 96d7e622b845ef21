"""WAND/block-max pruning must be exactly rank-neutral (SURVEY §7.3.7):
every eligible query's pruned top-k — docids AND float32 scores — equals
the exhaustive scorer's, across tie-heavy Zipf data and multi-segment
layouts, for k spanning heap-fill regimes."""

import os

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wandidx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=100, num_buckets=2))
    return IndexSearcher(d)


QUERIES = [
    "spark",
    "the",
    "data",
    "zzzmissing",
    "spark merge",
    "the a data",
    "customer window vector",
    "spark zzzmissing",
    "a the",
]


class TestWandRankIdentical:
    @pytest.mark.parametrize("q", QUERIES)
    @pytest.mark.parametrize("k", [1, 3, 10, 100])
    def test_matches_exhaustive(self, searcher, q, k):
        w = searcher.search(q, k, mode="auto")
        e = searcher.search(q, k, mode="exhaustive")
        assert list(w["docids"]) == list(e["docids"]), q
        assert np.array_equal(w["scores"], e["scores"]), q
        assert w["keys"] == e["keys"]

    def test_wand_mode_rejects_conjunction(self, searcher):
        with pytest.raises(ValueError):
            searcher.search("+a +b", 10, mode="wand")

    def test_relation_gte_when_pruned(self, searcher):
        # small k over a head term across many segments should prune
        r = searcher.search("the a data", 1, mode="auto")
        assert r["relation"] in ("EQ", "GTE")
        e = searcher.search("the a data", 1, mode="exhaustive")
        assert list(r["docids"]) == list(e["docids"])

    def test_synthetic_pages_corpus(self, ray_session, tmp_path_factory):
        """Zipf head-term ties across a multi-segment pages corpus."""
        from lucene_ray.corpus.generator import make_vocab, write_corpus

        d = str(tmp_path_factory.mktemp("pages"))
        idx = str(tmp_path_factory.mktemp("pidx"))
        paths = write_corpus(d, 3000, n_files=4, use_ray=False)
        build_index(
            paths, idx, IndexConfig(key_col="url", rows_per_segment=500)
        )
        s = IndexSearcher(idx)
        vocab = make_vocab()
        qs = [
            vocab[0],
            f"{vocab[0]} {vocab[1]}",
            f"{vocab[2]} {vocab[50]} {vocab[800]}",
            vocab[4000],
        ]
        for q in qs:
            for k in (5, 25):
                w = s.search(q, k, mode="auto")
                e = s.search(q, k, mode="exhaustive")
                assert list(w["docids"]) == list(e["docids"]), q
                assert np.array_equal(w["scores"], e["scores"]), q


class TestHitCountThreshold:
    """Exact hit counts below the 1000-doc threshold (EQ), lower bound
    past it (GTE) — IndexSearcher.java:100 / TotalHits semantics."""

    def test_exact_count_below_threshold(self, searcher):
        # 500-doc corpus: every WAND query counts exactly, relation EQ
        for q in ["the", "spark merge", "data"]:
            w = searcher.search(q, k=5)
            e = searcher.search(q, k=5, mode="exhaustive")
            assert w["relation"] == "EQ"
            assert w["total_hits"] == e["total_hits"]

    def test_gte_past_threshold(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = tmp_path / "big.parquet"
        n = 3000
        texts = [f"common filler{i % 7}" for i in range(n)]
        pq.write_table(
            pa.table({"doc_id": list(range(n)), "text": texts}), str(docs)
        )
        d = str(tmp_path / "idx")
        build_index(str(docs), d, IndexConfig(rows_per_segment=4000))
        s = IndexSearcher(d)
        r = s.search("common filler0", k=5)
        if r["relation"] == "GTE":
            assert r["total_hits"] >= 1000
        else:  # nothing was prunable — count must then be exact
            assert r["total_hits"] == n
        # forcing a tiny threshold produces a pruned lower-bound count
        terms = s._wand_eligible(
            __import__("lucene_ray.search.query", fromlist=["parse_query"])
            .parse_query("common filler0")
        )
        r2 = s._search_wand(terms, k=5, total_hits_threshold=10)
        e = s.search("common filler0", k=5, mode="exhaustive")
        assert list(r2["docids"]) == list(e["docids"])  # still rank-exact
        assert np.array_equal(r2["scores"], e["scores"])
        if r2["relation"] == "GTE":
            assert 10 <= r2["total_hits"] <= e["total_hits"]


class TestSearchAfterOnWand:
    def test_pagination_matches_exhaustive(self, searcher):
        full = searcher.search("the a data", k=30, mode="exhaustive")
        pages = []
        cursor = None
        for _ in range(3):
            r = searcher.search("the a data", k=10, after=cursor)
            assert searcher._wand_eligible(
                __import__("lucene_ray.search.query", fromlist=["parse_query"])
                .parse_query("the a data")
            ) is not None  # the query takes the pruned path
            pages.extend(zip(r["docids"], r["scores"]))
            cursor = (float(r["scores"][-1]), int(r["docids"][-1]))
        assert [d for d, _ in pages] == list(full["docids"])
        assert np.array_equal(
            np.array([s for _, s in pages], np.float32), full["scores"]
        )
