"""MultiReader composite searcher: a corpus split across two committed
indexes must search bit-identically to the single combined index
(collection stats sum across leaves, ``core/index/MultiReader.java``)."""

import os

import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

CFG = IndexConfig(rows_per_segment=120, num_buckets=2)

QUERIES = [
    "data",
    "spark merge",
    "+batch +stream -window",
    '"data processing"',
    "the customer",
]


@pytest.fixture(scope="module")
def searchers(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("mr")
    tbl = pq.read_table(DOCS)
    mid = len(tbl) // 2
    dirs = []
    for part, piece in enumerate((tbl.slice(0, mid), tbl.slice(mid))):
        d = str(root / f"half{part}")
        src = str(root / f"half{part}.parquet")
        pq.write_table(piece, src)
        build_index(src, d, CFG)
        dirs.append(d)
    single = str(root / "single")
    build_index(DOCS, single, CFG)
    return IndexSearcher(dirs), IndexSearcher(single)


class TestMultiReader:
    def test_stats_sum(self, searchers):
        multi, single = searchers
        assert multi.doc_count == single.doc_count
        assert multi.sum_ttf == single.sum_ttf
        assert multi.avgdl == single.avgdl

    @pytest.mark.parametrize("q", QUERIES)
    def test_search_identical(self, searchers, q):
        multi, single = searchers
        rm = multi.search(q, k=25)
        rs = single.search(q, k=25)
        assert list(rm["keys"]) == list(rs["keys"])
        assert [float(s) for s in rm["scores"]] == [
            float(s) for s in rs["scores"]
        ]

    def test_exhaustive_match_sets_equal(self, searchers):
        multi, single = searchers
        rm = multi.search("data", k=10**6)
        rs = single.search("data", k=10**6)
        assert sorted(rm["keys"]) == sorted(rs["keys"])


class TestMultiReaderDocBase:
    """Global docids must be unique across indexes (MultiReader docBase
    accumulation) and document() must resolve to the right leaf."""

    def test_docids_unique_and_document_resolves(self, searchers):
        multi, _ = searchers
        r = multi.search("the", k=10**6)
        docids = [int(d) for d in r["docids"]]
        assert len(docids) == len(set(docids))
        # every hit's stored document round-trips to its key
        for d, key in list(zip(docids, r["keys"]))[:50]:
            doc = multi.document(d)
            assert int(doc["doc_id"]) == int(key)

    def test_hits_span_both_halves(self, searchers):
        multi, single = searchers
        r = multi.search("the", k=10**6)
        bases = sorted(s.base_docid for s in multi.segments)
        # second index's leaves start past the first index's maxDoc
        first_max = max(
            s.base_docid + s.n_docs
            for s in multi.segments[: len(multi.segments) // 2]
        )
        assert any(int(d) >= first_max for d in r["docids"])
