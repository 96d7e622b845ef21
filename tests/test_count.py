"""``IndexSearcher.count`` — exact scoreless hit counting
(``core/search/IndexSearcher.java:495-526``): the df shortcut, the
two-clause inclusion-exclusion, and the exhaustive fallback must all
agree with the exhaustive search path's exact total_hits."""

import os

import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.searcher import IndexSearcher

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cntidx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=150, num_buckets=2))
    return IndexSearcher(d)


QUERIES = [
    "data",                # term df shortcut
    "zzzabsent",           # absent term → 0
    "zzzabsent the",       # two-clause, one empty
    "spark the",           # two-clause skewed
    "data model",          # two-clause balanced (no optimization)
    "data vector window",  # 3 clauses → fallback
    "+batch +stream",      # conjunction
    "+the -data",          # ReqExcl
    '"data processing"',   # phrase → fallback
]


def test_count_matches_exhaustive_total(searcher):
    for q in QUERIES:
        want = searcher.search(q, k=1, mode="exhaustive")["total_hits"]
        assert searcher.count(q) == want, q


def test_count_matchall(searcher):
    from lucene_ray.search.query import MatchAllQuery

    assert searcher.count(MatchAllQuery()) == sum(
        s.n_docs for s in searcher.segments
    )


def test_count_constant_score_unwrap(searcher):
    from lucene_ray.search.query import ConstantScoreQuery, TermQuery

    q = TermQuery("data")
    assert searcher.count(ConstantScoreQuery(q)) == searcher.count(q)


def test_count_respects_deletes(ray_session, tmp_path):
    """With deletes present the shortcuts are disabled and counts reflect
    live docs only."""
    from lucene_ray.index.deletes import delete_by_keys

    d = str(tmp_path / "idx")
    build_index(DOCS, d, IndexConfig(rows_per_segment=150, num_buckets=2))
    s0 = IndexSearcher(d)
    before = s0.count("the")
    hits = s0.search("the", k=5, mode="exhaustive")
    delete_by_keys(d, hits["keys"][:3])
    s1 = IndexSearcher(d)
    assert s1.count("the") == before - 3
