"""Sparse Boolean evaluation + leapfrog conjunction: the pruned paths must
be result-identical to exhaustive dense-style evaluation."""

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
    PhraseQuery,
    TermQuery,
    parse_query,
)
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sbidx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=120))
    return IndexSearcher(d)


def _eval_reference(s, q, seg_idx, states):
    """Dense reference evaluator (the round-1 semantics, kept as oracle)."""
    seg = s.segments[seg_idx]
    n = seg.n_docs
    F32 = np.float32
    scores = np.zeros(n, dtype=F32)
    should_count = np.zeros(n, dtype=np.int32)
    must_mask = None
    not_mask = np.zeros(n, dtype=bool)
    n_should = 0
    for occur, sub in q.clauses:
        r = s._eval(sub, seg_idx, states)
        if occur == SHOULD:
            n_should += 1
            scores[r.docids] += r.scores
            should_count[r.docids] += 1
        elif occur in (MUST, FILTER):
            if occur == MUST:
                scores[r.docids] += r.scores
            m = np.zeros(n, dtype=bool)
            m[r.docids] = True
            must_mask = m if must_mask is None else (must_mask & m)
        else:
            not_mask[r.docids] = True
    msm = q.minimum_should_match
    match = None
    if n_should:
        need = msm if must_mask is not None else max(1, msm)
        match = should_count >= need if need > 0 else None
    if must_mask is None and match is None:
        return np.empty(0, np.uint32), np.empty(0, F32)
    mask = must_mask if must_mask is not None else match
    if must_mask is not None and match is not None:
        mask = must_mask & match
    mask = mask & ~not_mask
    ids = np.flatnonzero(mask).astype(np.uint32)
    return ids, scores[ids]


QUERIES = [
    BooleanQuery(((MUST, TermQuery("data")), (MUST, TermQuery("spark")))),
    BooleanQuery(((MUST, TermQuery("the")), (FILTER, TermQuery("data")))),
    BooleanQuery(
        (
            (MUST, TermQuery("batch")),
            (MUST, TermQuery("stream")),
            (MUST_NOT, TermQuery("window")),
        )
    ),
    BooleanQuery(
        ((MUST, TermQuery("data")), (SHOULD, TermQuery("spark")))
    ),
    BooleanQuery(
        (
            (SHOULD, TermQuery("data")),
            (SHOULD, TermQuery("spark")),
            (SHOULD, TermQuery("merge")),
        ),
        minimum_should_match=2,
    ),
    BooleanQuery(
        ((MUST, PhraseQuery(("batch", "stream"))), (MUST_NOT, TermQuery("the")))
    ),
    BooleanQuery(((MUST, TermQuery("zzzabsent")), (MUST, TermQuery("data")))),
    BooleanQuery(((MUST_NOT, TermQuery("data")),)),  # no positive clause
]


class TestSparseEqualsDense:
    @pytest.mark.parametrize("qi", range(len(QUERIES)))
    def test_per_segment_identical(self, searcher, qi):
        from lucene_ray.search.query import query_terms

        q = QUERIES[qi]
        states = searcher.term_states(query_terms(q))
        for si in range(len(searcher.segments)):
            want_ids, want_scores = _eval_reference(searcher, q, si, states)
            got = searcher._eval_bool(q, si, states)
            assert np.array_equal(got.docids, want_ids), f"seg {si}"
            assert np.array_equal(got.scores, want_scores), f"seg {si}"

    def test_conjunction_fast_path_taken(self, searcher):
        from lucene_ray.search.query import query_terms

        q = QUERIES[0]
        states = searcher.term_states(query_terms(q))
        assert searcher._eval_conj_terms(q, 0, states) is not None
        # phrase clause → general path
        qp = QUERIES[5]
        states = searcher.term_states(query_terms(qp))
        assert searcher._eval_conj_terms(qp, 0, states) is None

    def test_end_to_end_search_identical(self, searcher):
        r = searcher.search("+the +data -spark", k=10)
        r2 = searcher.search("+the +data -spark", k=10, mode="exhaustive")
        assert list(r["docids"]) == list(r2["docids"])
        assert np.array_equal(r["scores"], r2["scores"])


class TestLookupDocs:
    def test_probe_matches_full_decode(self, searcher):
        seg = searcher.segments[0]
        ti = seg.lookup("the")
        assert ti is not None
        view = seg.postings(ti)
        ids, freqs = view.decode_all()
        # probe a mix of present and absent docids
        targets = np.unique(
            np.concatenate([ids[::3].astype(np.int64), np.arange(0, seg.n_docs, 7)])
        )
        mask, fr = view.lookup_docs(targets)
        want_mask = np.isin(targets, ids.astype(np.int64))
        assert np.array_equal(mask, want_mask)
        pos = np.searchsorted(ids.astype(np.int64), targets[mask])
        assert np.array_equal(fr[mask], freqs[pos])
        assert (fr[~mask] == 0).all()


class TestMinimumShouldMatch:
    """BooleanQuery.minimumNumberShouldMatch over the engine's sparse
    evaluator, checked against a brute-force term-set reference."""

    def _brute(self, searcher, terms, msm):
        import pyarrow.parquet as pq

        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        out = set()
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            toks = set((t or "").lower().split())
            if sum(1 for x in terms if x in toks) >= msm:
                out.add(int(d))
        return out

    @pytest.mark.parametrize("msm", [1, 2, 3])
    def test_match_set_vs_bruteforce(self, searcher, msm):
        terms = ["spark", "merge", "window"]
        q = BooleanQuery([(SHOULD, TermQuery(t)) for t in terms], msm)
        r = searcher.search(q, k=10**6)
        got = {int(k) for k in r["keys"]}
        assert got == self._brute(searcher, terms, msm)

    def test_msm_with_absent_term_degrades_to_conjunction(self, searcher):
        q = BooleanQuery(
            [
                (SHOULD, TermQuery("the")),
                (SHOULD, TermQuery("customer")),
                (SHOULD, TermQuery("zzzabsent")),
            ],
            2,
        )
        r = searcher.search(q, k=10**6)
        got = {int(k) for k in r["keys"]}
        assert got == self._brute(searcher, ["the", "customer"], 2)

    def test_msm_scores_sum_all_matching_clauses(self, searcher):
        # a doc matching all 3 terms scores identically with and
        # without msm (msm filters, never re-weights)
        terms = ["spark", "merge", "window"]
        q1 = BooleanQuery([(SHOULD, TermQuery(t)) for t in terms], 0)
        q2 = BooleanQuery([(SHOULD, TermQuery(t)) for t in terms], 2)
        r1 = searcher.search(q1, k=10**6)
        r2 = searcher.search(q2, k=10**6)
        s1 = dict(zip([int(k) for k in r1["keys"]], r1["scores"]))
        s2 = dict(zip([int(k) for k in r2["keys"]], r2["scores"]))
        assert s2  # non-empty
        for d, s in s2.items():
            assert s1[d] == s


class TestCoveringQuery:
    """Per-doc minimum-should-match from a DV expression
    (CoveringQuery.java semantics) vs a brute-force reference."""

    @pytest.fixture(scope="class")
    def cov_searcher(self, ray_session, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("covidx"))
        build_index(
            DOCS, d, IndexConfig(rows_per_segment=120, dv_cols=("n_chars",))
        )
        return IndexSearcher(d)

    def test_match_set_and_scores(self, cov_searcher):
        import math

        import pyarrow.parquet as pq
        from lucene_ray.search.query import CoveringQuery

        terms = ["spark", "merge", "data", "the"]
        q = CoveringQuery(tuple(TermQuery(t) for t in terms), "1 + n_chars / 300")
        r = cov_searcher.search(q, k=10**6)
        got = {int(k) for k in r["keys"]}

        tbl = pq.read_table(DOCS, columns=["doc_id", "text", "n_chars"])
        want = set()
        for d, t, nc in zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("n_chars").to_pylist(),
        ):
            hits = sum(1 for x in terms if x in set((t or "").lower().split()))
            need = max(1, math.floor(1 + nc / 300))
            if hits >= need:
                want.add(int(d))
        assert got == want

    def test_constant_expression_equals_msm(self, cov_searcher):
        # CoveringQuery with a constant min == BooleanQuery msm
        from lucene_ray.search.query import CoveringQuery

        terms = ["spark", "merge", "window"]
        qc = CoveringQuery(tuple(TermQuery(t) for t in terms), "2")
        qb = BooleanQuery([(SHOULD, TermQuery(t)) for t in terms], 2)
        rc = cov_searcher.search(qc, k=10**6)
        rb = cov_searcher.search(qb, k=10**6)
        assert {int(k) for k in rc["keys"]} == {int(k) for k in rb["keys"]}
        sc = dict(zip([int(k) for k in rc["keys"]], rc["scores"]))
        sb = dict(zip([int(k) for k in rb["keys"]], rb["scores"]))
        assert sc == sb
