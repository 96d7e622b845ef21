"""Stored term vectors (TermVectorsFormat role): flush-time transpose
must equal re-analysis, and vectors must survive merges bit-for-bit."""

from collections import Counter

import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.merge import force_merge
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

CFG = IndexConfig(
    rows_per_segment=120, num_buckets=2, store_term_vectors=True
)


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tvidx"))
    build_index(DOCS, d, CFG)
    return d


def _all_vectors(searcher):
    out = {}
    for seg in searcher.segments:
        for local in range(seg.n_docs):
            t = seg.term_vector(local)
            key = int(seg.docmap[local].as_py())
            out[key] = dict(
                zip(t.column("term").to_pylist(), t.column("freq").to_pylist())
            )
    return out


class TestTermVectors:
    def test_vectors_equal_reanalysis(self, index_dir):
        s = IndexSearcher(index_dir)
        got = _all_vectors(s)
        an = Analyzer()
        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            terms, _ = an.analyze_fast(t or "")
            assert got[int(d)] == dict(Counter(terms))

    def test_terms_sorted_within_doc(self, index_dir):
        s = IndexSearcher(index_dir)
        seg = s.segments[0]
        t = seg.term_vector(0)
        terms = t.column("term").to_pylist()
        assert terms == sorted(terms)

    def test_vectors_survive_force_merge(self, index_dir, ray_session):
        before = _all_vectors(IndexSearcher(index_dir))
        force_merge(index_dir, max_segments=1)
        after_s = IndexSearcher(index_dir)
        assert len(after_s.segments) == 1
        assert _all_vectors(after_s) == before

    def test_global_docid_lookup(self, index_dir):
        s = IndexSearcher(index_dir)
        r = s.search("data", k=5)
        for d, key in zip(r["docids"], r["keys"]):
            t = s.term_vector(int(d))
            assert "data" in t.column("term").to_pylist()


class TestMltFromTv:
    def test_tv_mlt_equals_text_mlt(self, ray_session):
        from lucene_ray.pipelines.mlt import more_like_this, more_like_this_tv

        sf = "/root/testdata/sf0.001"
        a = more_like_this(sf).to_pandas()
        b = more_like_this_tv(sf).to_pandas()
        assert a.equals(b)
