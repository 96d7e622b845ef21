"""IndexSearcher.explain: root value must equal the search() score
bit-for-bit, match flags must reflect clause semantics, and the BM25
term detail tree must carry the real freq/dl/idf factors
(``core/search/IndexSearcher.java:615-632``,
``core/search/similarities/BM25Similarity.java:180-215``)."""

import math

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    TermQuery,
)
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("explidx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=150, keyword_cols=("lang",)))
    return IndexSearcher(d)


def _top_query(searcher, qtext, k=5):
    r = searcher.search(qtext, k=k, mode="exhaustive")
    assert len(r["docids"]) > 0
    return r


QUERIES = [
    "sort",
    "sort merge",
    "+sort +order",
    "sort -order",
    '"sort order"~2',
    "lang:en +sort",
]


@pytest.mark.parametrize("qtext", QUERIES)
def test_explain_value_equals_search_score(searcher, qtext):
    r = _top_query(searcher, qtext)
    for d, s in zip(r["docids"], r["scores"]):
        e = searcher.explain(qtext, int(d))
        assert e.match
        assert np.float32(e.value) == s


def test_explain_no_match(searcher):
    r = _top_query(searcher, "sort")
    hit = set(int(d) for d in r["docids"])
    # find a doc not matching "sort" at all
    all_ids = set(range(searcher.doc_count))
    rr = searcher.search("sort", k=10**9, mode="exhaustive")
    nonmatch = sorted(all_ids - set(int(d) for d in rr["docids"]))
    assert nonmatch, "corpus should contain docs without the term"
    e = searcher.explain("sort", nonmatch[0])
    assert not e.match and e.value == 0.0


def test_bm25_term_detail_tree(searcher):
    r = _top_query(searcher, "sort")
    d = int(r["docids"][0])
    e = searcher.explain(TermQuery("sort"), d)
    assert "weight(:sort" in e.description or "sort" in e.description
    score_node = e.details[0]
    assert "computed as boost * idf * tf" in score_node.description
    boost, idf_n, tf_n = score_node.details
    assert boost.value == 1.0
    # idf detail holds (n, N) and recomputes
    n = idf_n.details[0].value
    N = idf_n.details[1].value
    assert math.isclose(
        idf_n.value, math.log(1 + (N - n + 0.5) / (n + 0.5)), rel_tol=1e-6
    )
    # tf detail: freq >= 1, dl quantized positive, avgdl > 0
    freq = tf_n.details[0].value
    dl = tf_n.details[3].value
    avgdl = tf_n.details[4].value
    assert freq >= 1 and dl > 0 and avgdl > 0
    # boost * idf * tf approximates the fused score (float rounding aside)
    assert math.isclose(
        e.value, boost.value * idf_n.value * tf_n.value, rel_tol=1e-5
    )


def test_boolean_explain_structure(searcher):
    q = BooleanQuery(
        (
            (MUST, TermQuery("sort")),
            (SHOULD, TermQuery("merge")),
            (FILTER, TermQuery("en", field="lang")),
            (MUST_NOT, TermQuery("zzzznotaterm")),
        )
    )
    r = searcher.search(q, k=3, mode="exhaustive")
    assert len(r["docids"]) > 0
    d = int(r["docids"][0])
    e = searcher.explain(q, d)
    assert e.match and e.description == "sum of:"
    assert np.float32(e.value) == r["scores"][0]
    # filter clause contributes 0 and is marked as such
    filt = [x for x in e.details if "filter clause" in x.description]
    assert filt and filt[0].value == 0.0
    # a doc failing the MUST should explain as no-match with reason
    rr = searcher.search(TermQuery("sort"), k=10**9, mode="exhaustive")
    non = sorted(set(range(searcher.doc_count)) - set(int(x) for x in rr["docids"]))
    e2 = searcher.explain(q, non[0])
    assert not e2.match
    assert "required" in e2.description or "clauses" in e2.description


def test_constant_score_and_dismax(searcher):
    cq = ConstantScoreQuery(TermQuery("sort"), boost=2.5)
    r = searcher.search(cq, k=2, mode="exhaustive")
    d = int(r["docids"][0])
    e = searcher.explain(cq, d)
    assert e.match and e.value == 2.5 and e.details[0].match

    dm = DisjunctionMaxQuery(
        (TermQuery("sort"), TermQuery("merge")), tie_breaker=0.1
    )
    r2 = searcher.search(dm, k=2, mode="exhaustive")
    d2 = int(r2["docids"][0])
    e2 = searcher.explain(dm, d2)
    assert e2.match and np.float32(e2.value) == r2["scores"][0]
    assert "max plus" in e2.description


def test_explain_str_renders_tree(searcher):
    r = _top_query(searcher, "sort merge")
    s = str(searcher.explain("sort merge", int(r["docids"][0])))
    assert "sum of:" in s and "idf" in s and s.count("\n") > 5


def test_phrase_explain_freq(searcher):
    q = PhraseQuery(("sort", "order"))
    r = searcher.search(q, k=3, mode="exhaustive")
    assert len(r["docids"]) > 0
    for d, s in zip(r["docids"], r["scores"]):
        e = searcher.explain(q, int(d))
        assert e.match and np.float32(e.value) == s
        score_node = e.details[0]
        _, idf_n, tf_n = score_node.details
        freq = tf_n.details[0].value
        assert freq >= 1 and freq == int(freq)  # exact phrase: integer freq
        # idf detail = sum of per-term idfs
        assert math.isclose(
            idf_n.value, sum(x.value for x in idf_n.details), rel_tol=1e-9
        )
    # sloppy: float slop-weighted freq, still value-exact
    qs = PhraseQuery(("sort", "order"), slop=2)
    rs = searcher.search(qs, k=3, mode="exhaustive")
    es = searcher.explain(qs, int(rs["docids"][0]))
    assert es.match and np.float32(es.value) == rs["scores"][0]
    assert "slop-weighted" in str(es)
