"""MultiTermQuery family: parser forms, dictionary expansion, edit
distance semantics."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.multiterm import (
    damerau_levenshtein,
    levenshtein,
    wildcard_literal_head,
    wildcard_regex,
)
from lucene_ray.search.query import (
    FuzzyQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
    parse_query,
)
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mtidx"))
    build_index(
        DOCS,
        d,
        IndexConfig(rows_per_segment=180, keyword_cols=("lang",)),
    )
    return IndexSearcher(d)


class TestParser:
    def test_prefix(self):
        assert parse_query("spa*") == PrefixQuery("spa")

    def test_wildcard(self):
        assert parse_query("s?ark") == WildcardQuery("s?ark")
        assert parse_query("*er") == WildcardQuery("*er")
        assert parse_query("a*b*") == WildcardQuery("a*b*")

    def test_fuzzy(self):
        assert parse_query("spark~1") == FuzzyQuery("spark", max_edits=1)
        assert parse_query("spark~9") == FuzzyQuery("spark", max_edits=2)  # cap

    def test_field_scoped(self):
        assert parse_query("lang:e*") == PrefixQuery("e", field="lang")

    def test_lowercased_not_tokenized(self):
        assert parse_query("SPA*") == PrefixQuery("spa")

    def test_plain_term_still_term(self):
        assert parse_query("spark") == TermQuery("spark")


class TestExpansion:
    def _tokens(self):
        import pyarrow.parquet as pq

        tbl = pq.read_table(DOCS, columns=["doc_id", "text", "lang"])
        rows = []
        for d, t, l in zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("lang").to_pylist(),
        ):
            rows.append((int(d), (t or "").split(), l))
        return rows

    def test_prefix_match_set(self, searcher):
        want = sorted(
            d for d, toks, _ in self._tokens() if any(t.startswith("s") for t in toks)
        )
        r = searcher.search("s*", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want
        assert (r["scores"] == np.float32(1.0)).all()

    def test_prefix_does_not_leak_keyword_terms(self, searcher):
        # "l*" (text) must not match docs via the lang\x1f... keys
        want = sorted(
            d for d, toks, _ in self._tokens() if any(t.startswith("l") for t in toks)
        )
        r = searcher.search("l*", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want

    def test_keyword_prefix(self, searcher):
        want = sorted(d for d, _, l in self._tokens() if l.startswith("e"))
        r = searcher.search("lang:e*", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want

    def test_wildcard_match_set(self, searcher):
        rx = wildcard_regex("s?a*")
        want = sorted(
            d for d, toks, _ in self._tokens() if any(rx.fullmatch(t) for t in toks)
        )
        r = searcher.search("s?a*", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want

    def test_fuzzy_match_set(self, searcher):
        want = sorted(
            d
            for d, toks, _ in self._tokens()
            if any(damerau_levenshtein(t, "scann", cap=1) <= 1 for t in toks)
        )
        r = searcher.search("scann~1", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want
        assert len(want) > 0

    def test_multiterm_as_boolean_clause(self, searcher):
        """+prefix -term composes through the sparse boolean path."""
        toks = self._tokens()
        want = sorted(
            d
            for d, ts, _ in toks
            if any(t.startswith("st") for t in ts) and "merge" not in ts
        )
        r = searcher.search("+st* -merge", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want


class TestEditDistance:
    def test_known_values(self):
        assert damerau_levenshtein("ca", "abc") == 2  # full Damerau
        assert damerau_levenshtein("ab", "ba") == 1
        assert levenshtein("ab", "ba") == 2
        assert damerau_levenshtein("kitten", "sitting") == 3
        assert damerau_levenshtein("", "abc") == 3
        assert damerau_levenshtein("abc", "abc") == 0

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abcd", max_size=8),
        st.text(alphabet="abcd", max_size=8),
    )
    def test_matches_duckdb(self, a, b):
        con = duckdb.connect()
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet="abc", max_size=6), st.text(alphabet="abc", max_size=6))
    def test_metric_properties(self, a, b):
        d = damerau_levenshtein(a, b)
        assert d == damerau_levenshtein(b, a)
        assert (d == 0) == (a == b)
        assert d <= max(len(a), len(b))

    def test_wildcard_head(self):
        assert wildcard_literal_head("abc*def") == "abc"
        assert wildcard_literal_head("*x") == ""
        assert wildcard_literal_head("plain") == "plain"


class TestRegexpQuery:
    """RegexpQuery: anchored dictionary regexp (RegexpQuery.java role)."""

    def test_parse_and_match(self, searcher):
        from lucene_ray.search.query import RegexpQuery

        q = parse_query("/st[aeiou][a-z]*/")
        assert isinstance(q, RegexpQuery) and q.regexp == "st[aeiou][a-z]*"
        r = searcher.search("/sta[a-z]*/", k=10**9, mode="exhaustive")
        r2 = searcher.search("sta*", k=10**9, mode="exhaustive")
        assert set(r["keys"]) == set(r2["keys"])  # same expansion as prefix

    def test_alternation_equals_union(self, searcher):
        alt = searcher.search("/(data|spark)/", k=10**9, mode="exhaustive")
        a = searcher.search("data", k=10**9, mode="exhaustive")
        b = searcher.search("spark", k=10**9, mode="exhaustive")
        assert set(alt["keys"]) == set(a["keys"]) | set(b["keys"])

    def test_literal_head_extraction(self):
        from lucene_ray.search.multiterm import regexp_literal_head

        assert regexp_literal_head("star[0-9]+") == "star"
        assert regexp_literal_head("star*x") == "sta"  # * makes r optional
        assert regexp_literal_head("sta?r") == "st"
        assert regexp_literal_head("plain") == "plain"
        assert regexp_literal_head("(a|b)c") == ""
        assert regexp_literal_head("ab{2,3}") == "a"

    def test_keyword_field_regexp(self, searcher):
        r = searcher.search("#lang:/e./ data", k=10**9, mode="exhaustive")
        en = searcher.search("#lang:en data", k=10**9, mode="exhaustive")
        es = searcher.search("#lang:es data", k=10**9, mode="exhaustive")
        assert set(r["keys"]) == set(en["keys"]) | set(es["keys"])


class TestTermRange:
    """TermRangeQuery: lexicographic dictionary range, constant score
    (``core/search/TermRangeQuery.java:33-58``)."""

    def test_parser(self):
        from lucene_ray.search.query import TermRangeQuery

        assert parse_query("[apple TO banana]") == TermRangeQuery(
            "apple", "banana"
        )
        assert parse_query("lang:[de TO es]") == TermRangeQuery(
            "de", "es", field="lang"
        )

    def test_matches_sql_between(self, searcher):
        con = duckdb.connect()
        con.execute(f"create view documents as select * from '{DOCS}'")
        for lo, hi in (("sort", "spark"), ("a", "c"), ("st", "sz")):
            want = sorted(
                r[0]
                for r in con.execute(
                    "select distinct doc_id from (select doc_id, "
                    "unnest(string_split(text, ' ')) as t from documents) "
                    f"where t between '{lo}' and '{hi}' and t <> ''"
                ).fetchall()
            )
            r = searcher.search(
                f"[{lo} TO {hi}]", k=10**9, mode="exhaustive"
            )
            assert sorted(r["keys"]) == want

    def test_bound_flags_and_open_ends(self, searcher):
        from lucene_ray.search.query import TermRangeQuery

        inc = searcher.search(
            TermRangeQuery("sort", "spark"), k=10**9, mode="exhaustive"
        )
        exc = searcher.search(
            TermRangeQuery("sort", "spark", include_lower=False,
                           include_upper=False),
            k=10**9, mode="exhaustive",
        )
        assert set(exc["keys"]) <= set(inc["keys"])
        # exclusive bounds must drop docs matching ONLY the bound terms
        only_bounds = searcher.search(
            "sort spark", k=10**9, mode="exhaustive"
        )
        assert len(exc["keys"]) < len(inc["keys"]) or not only_bounds["keys"]
        # open upper bound reaches the dictionary tail
        tail = searcher.search(
            TermRangeQuery("z", None), k=10**9, mode="exhaustive"
        )
        zz = searcher.search(PrefixQuery("z"), k=10**9, mode="exhaustive")
        assert set(zz["keys"]) <= set(tail["keys"])

    def test_keyword_field_range(self, searcher):
        con = duckdb.connect()
        con.execute(f"create view documents as select * from '{DOCS}'")
        want = sorted(
            r[0]
            for r in con.execute(
                "select doc_id from documents where lang between 'de' and 'es'"
            ).fetchall()
        )
        r = searcher.search("lang:[de TO es]", k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == want
