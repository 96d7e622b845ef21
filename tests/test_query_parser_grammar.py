"""Classic QueryParser grammar (``QueryParser.jj:105``): AND/OR/NOT
keywords + ``&&``/``||``/``!``, parenthesized groups (nested, boosted),
classic conjunction-promotion semantics, mixed with multiterm suffix
syntax — plus regression cover that the flat syntax parses unchanged."""

import pyarrow.parquet as pq
import pytest

from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
    WildcardQuery,
    parse_query,
)


def occs(q):
    assert isinstance(q, BooleanQuery)
    return [o for o, _ in q.clauses]


class TestKeywords:
    def test_and_promotes_both(self):
        q = parse_query("a AND b")
        assert occs(q) == [MUST, MUST]

    def test_or_keeps_should(self):
        q = parse_query("a OR b")
        assert occs(q) == [SHOULD, SHOULD]

    def test_classic_mixed_and_or(self):
        # classic quirk: "a AND b OR c" -> +a +b c
        q = parse_query("a AND b OR c")
        assert occs(q) == [MUST, MUST, SHOULD]

    def test_not(self):
        q = parse_query("a NOT b")
        assert occs(q) == [SHOULD, MUST_NOT]

    def test_and_not(self):
        q = parse_query("a AND NOT b")
        assert occs(q) == [MUST, MUST_NOT]

    def test_symbol_forms(self):
        q = parse_query("a && b || !c")
        assert occs(q) == [MUST, MUST, MUST_NOT]

    def test_explicit_sign_wins_over_and(self):
        q = parse_query("-a AND b")
        assert occs(q) == [MUST_NOT, MUST]

    def test_keyword_prefix_words_are_terms(self):
        q = parse_query("android organ nothing")
        assert [s.term for _, s in q.clauses] == ["android", "organ", "nothing"]


class TestGroups:
    def test_grouping(self):
        q = parse_query("(a b) AND c")
        assert occs(q) == [MUST, MUST]
        inner = q.clauses[0][1]
        assert occs(inner) == [SHOULD, SHOULD]

    def test_nested(self):
        q = parse_query("((a AND b) OR (c AND d))")
        assert occs(q) == [SHOULD, SHOULD]
        assert occs(q.clauses[0][1]) == [MUST, MUST]

    def test_group_boost_distributes(self):
        q = parse_query("+(a b)^2 -c")
        grp = q.clauses[0][1]
        assert all(s.boost == 2.0 for _, s in grp.clauses)

    def test_signed_group(self):
        q = parse_query("!(a b) c")
        assert occs(q) == [MUST_NOT, SHOULD]

    def test_single_clause_group_collapses(self):
        q = parse_query("(a) AND b")
        assert isinstance(q.clauses[0][1], TermQuery)

    def test_empty_group_ignored(self):
        q = parse_query("( ) a")
        assert isinstance(q, TermQuery)

    def test_stray_close_paren_lenient(self):
        q = parse_query("a ) b")
        assert len(q.clauses) == 2


class TestMixedMultiterm:
    def test_wildcard_fuzzy_in_groups(self):
        q = parse_query("(wild*card OR fuzz~1) AND pre*")
        grp = q.clauses[0][1]
        assert isinstance(grp.clauses[0][1], WildcardQuery)
        assert isinstance(grp.clauses[1][1], FuzzyQuery)
        assert isinstance(q.clauses[1][1], PrefixQuery)
        assert occs(q) == [MUST, MUST]

    def test_phrase_and_filter_and_range(self):
        q = parse_query('"the data"~2 AND lang:en AND #n_chars:[1 TO 5]')
        assert isinstance(q.clauses[0][1], PhraseQuery)
        assert q.clauses[1][1] == TermQuery("en", field="lang")
        assert isinstance(q.clauses[2][1], RangeQuery)
        assert occs(q) == [MUST, MUST, FILTER]


class TestFlatRegression:
    """The pre-grammar flat surface parses to identical plans."""

    CASES = [
        "spark",
        "the data",
        "+data -spam",
        "data #lang:en",
        '"a phrase"~3',
        "term^2.5",
        "wild*card",
        "fuzzy~2",
        "/rege.p/",
        "data #n_chars:[150 TO 400]",
        "field:[alpha TO omega]",
    ]

    @pytest.mark.parametrize("text", CASES)
    def test_parses(self, text):
        q = parse_query(text)
        assert q is not None

    def test_flat_occurs(self):
        q = parse_query("+a -b #lang:en d")
        assert occs(q) == [MUST, MUST_NOT, FILTER, SHOULD]


class TestEngineEvaluation:
    """Grouped queries evaluate exactly: brute-force set algebra over
    the raw corpus equals the engine's match set."""

    @pytest.fixture(scope="class")
    def searcher(self, ray_session, tmp_path_factory):
        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig
        from lucene_ray.search.searcher import IndexSearcher

        d = str(tmp_path_factory.mktemp("grpidx") / "idx")
        build_index(
            "/root/testdata/sf0.001/documents.parquet",
            d,
            IndexConfig(rows_per_segment=200),
        )
        return IndexSearcher(d)

    @pytest.fixture(scope="class")
    def corpus(self):
        t = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        )
        return {
            int(i): set((txt or "").lower().split())
            for i, txt in zip(
                t["doc_id"].to_pylist(), t["text"].to_pylist()
            )
        }

    CASES = [
        (
            "(spark OR merge) AND (data OR vector)",
            lambda w: (("spark" in w) or ("merge" in w))
            and (("data" in w) or ("vector" in w)),
        ),
        (
            "data AND NOT spark",
            lambda w: ("data" in w) and ("spark" not in w),
        ),
        (
            "((a AND the) OR (data AND vector))",
            lambda w: (("a" in w) and ("the" in w))
            or (("data" in w) and ("vector" in w)),
        ),
        (
            "(vector OR merge) AND NOT (spark AND the)",
            lambda w: (("vector" in w) or ("merge" in w))
            and not (("spark" in w) and ("the" in w)),
        ),
    ]

    @pytest.mark.parametrize("text,pred", CASES)
    def test_match_set(self, searcher, corpus, text, pred):
        r = searcher.search(text, k=10**6)
        got = {int(x) for x in r["keys"]}
        want = {d for d, ws in corpus.items() if pred(ws)}
        assert got == want
