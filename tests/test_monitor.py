"""MemoryIndex + Monitor (percolation): match sets must equal the real
segmented index's match sets for the same queries (``lucene/memory``'s
MemoryIndex contract), and the presearcher's trigger-term pruning must
never lose a match (``lucene/monitor`` TermFilteredPresearcher)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.monitor import (
    MemoryIndex,
    Monitor,
    trigger_terms,
)
from lucene_ray.search.query import (
    BooleanQuery,
    MUST,
    PhraseQuery,
    SHOULD,
    TermQuery,
    parse_query,
)
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

QUERIES = [
    "spark",
    "+batch +stream",
    "data -window",
    '"sort order"',
    '"merge sort"~2',
    "st*",
    "[sort TO spark]",
    "#lang:de +merge",
    "the data merge",
]


@pytest.fixture(scope="module")
def corpus():
    return pq.read_table(DOCS)


@pytest.fixture(scope="module")
def mem(corpus):
    return MemoryIndex(
        corpus.column("text").to_pylist(),
        keyword_cols={"lang": corpus.column("lang").to_pylist()},
    )


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory, corpus):
    d = str(tmp_path_factory.mktemp("monidx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=150, keyword_cols=("lang",)))
    return IndexSearcher(d)


class TestMemoryIndexEqualsRealIndex:
    @pytest.mark.parametrize("qtext", QUERIES)
    def test_match_set_parity(self, mem, searcher, corpus, qtext):
        ids = corpus.column("doc_id").to_pylist()
        got = sorted(ids[int(d)] for d in mem.match(qtext))
        want = sorted(
            searcher.search(qtext, k=10**9, mode="exhaustive")["keys"]
        )
        assert got == want

    def test_unsupported_type_raises(self, mem):
        from lucene_ray.search.query import FuzzyQuery

        with pytest.raises(TypeError):
            mem.match(FuzzyQuery("spark"))


class TestPresearcher:
    def test_trigger_extraction(self):
        assert trigger_terms(parse_query("spark")) == {"spark"}
        assert trigger_terms(parse_query('"sort order"')) == {"sort"}
        # conjunction: any one required clause's terms suffice
        t = trigger_terms(parse_query("+batch +stream"))
        assert t in ({"batch"}, {"stream"})
        # disjunction: union of all
        assert trigger_terms(parse_query("a b")) == {"a", "b"}
        # prefix / keyword-only: unprunable
        assert trigger_terms(parse_query("st*")) is None
        assert trigger_terms(parse_query("lang:de")) is None

    def test_pruning_never_loses_matches(self, corpus):
        """For every query: matches via Monitor (with pruning) ==
        matches via direct MemoryIndex evaluation, across many small
        batches (some of which lack the trigger terms entirely)."""
        texts = corpus.column("text").to_pylist()
        langs = corpus.column("lang").to_pylist()
        mon = Monitor()
        for i, q in enumerate(QUERIES):
            mon.register(i, q)
        got = set()
        for s in range(0, len(texts), 40):
            batch = MemoryIndex(
                texts[s : s + 40],
                keyword_cols={"lang": langs[s : s + 40]},
            )
            for d, qid in mon.match_batch(batch):
                got.add((s + d, qid))
        want = set()
        full = MemoryIndex(texts, keyword_cols={"lang": langs})
        for i, q in enumerate(QUERIES):
            for d in full.match(q):
                want.add((int(d), i))
        assert got == want

    def test_skip_counts(self):
        """A batch without the trigger term must not evaluate the query
        (observable: no matches, and has_any_term is False)."""
        mem = MemoryIndex(["alpha beta", "beta gamma"])
        mon = Monitor()
        mon.register("q", "zeta")
        assert mon.match_batch(mem) == []
        assert not mem.has_any_term({"zeta"})


class TestMemoryIndexShapes:
    def test_msm_and_empty_docs(self):
        mem = MemoryIndex(["a b c", "", "a c", "b c"])
        q = BooleanQuery(
            (
                (SHOULD, TermQuery("a")),
                (SHOULD, TermQuery("b")),
                (SHOULD, TermQuery("c")),
            ),
            minimum_should_match=2,
        )
        assert list(mem.match(q)) == [0, 2, 3]

    def test_phrase_without_positions_raises(self):
        mem = MemoryIndex(["a b"], with_positions=False)
        with pytest.raises(ValueError):
            mem.match(PhraseQuery(("a", "b")))
