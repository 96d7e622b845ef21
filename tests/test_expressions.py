"""Expressions module (lucene/expressions role): parser/eval unit tests
+ ``search_expr`` equivalence against a hand-computed re-rank."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.expressions import Expression
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


class TestParser:
    def test_precedence_and_funcs(self):
        e = Expression("1 + 2 * 3 - 4 / 2")
        assert float(e.evaluate({})) == 5.0
        e = Expression("-2 * 3")
        assert float(e.evaluate({})) == -6.0
        e = Expression("(1 + 2) * 3")
        assert float(e.evaluate({})) == 9.0
        e = Expression("pow(2, 10) + max(1, 2) + min(5, 3) + abs(-4)")
        assert float(e.evaluate({})) == 1024 + 2 + 3 + 4
        e = Expression("ln(1) + log10(100) + sqrt(16)")
        assert float(e.evaluate({})) == 0 + 2 + 4

    def test_vectorized_variables(self):
        e = Expression("_score * 2 + sqrt(x)")
        out = e.evaluate(
            {"_score": np.array([1.0, 2.0]), "x": np.array([4.0, 9.0])}
        )
        assert list(out) == [4.0, 7.0]
        assert e.variables == ["_score", "x"]

    def test_scientific_notation(self):
        assert float(Expression("1e3 + 2.5e-1").evaluate({})) == 1000.25

    def test_errors(self):
        with pytest.raises(ValueError, match="unknown function"):
            Expression("nope(1)")
        with pytest.raises(ValueError, match="takes 2 args"):
            Expression("pow(2)")
        with pytest.raises(ValueError):
            Expression("1 +")
        with pytest.raises(ValueError, match="trailing"):
            Expression("1 2")
        with pytest.raises(ValueError, match="syntax error"):
            Expression("a @ b")
        with pytest.raises(KeyError, match="unbound"):
            Expression("x + 1").evaluate({})


class TestSearchExpr:
    @pytest.fixture(scope="class")
    def idx(self, ray_session, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("expridx"))
        build_index(
            DOCS,
            d,
            IndexConfig(rows_per_segment=150, dv_cols=("n_chars", "doc_id")),
        )
        return d

    def test_matches_manual_rerank(self, idx):
        s = IndexSearcher(idx)
        full = s.search("data", k=10**9, mode="exhaustive")
        import pyarrow.parquet as pq

        tbl = pq.read_table(DOCS, columns=["doc_id", "n_chars"])
        nc = dict(
            zip(tbl.column("doc_id").to_pylist(), tbl.column("n_chars").to_pylist())
        )
        want = sorted(
            (
                (-(float(sc) + 0.1 * np.sqrt(float(nc[key]))), key)
                for key, sc in zip(full["keys"], full["scores"])
            ),
        )[:10]
        r = s.search_expr("data", "_score + 0.1 * sqrt(n_chars)", k=10)
        assert r["keys"] == [k for _, k in want]
        assert r["expr_values"] == [-v for v, _ in want]
        assert r["total_hits"] == full["total_hits"]

    def test_constant_expression(self, idx):
        s = IndexSearcher(idx)
        r = s.search_expr("data", "7", k=5)
        # all values equal → ties by docid ascending
        assert r["expr_values"] == [7.0] * 5
        assert list(r["docids"]) == sorted(r["docids"])

    def test_score_only_equals_relevance_rank(self, idx):
        s = IndexSearcher(idx)
        a = s.search_expr("data merge", "_score", k=10)
        b = s.search("data merge", k=10, mode="exhaustive")
        assert a["keys"] == list(b["keys"])
