"""Fork scoring extras (Bayesian calibration, log-odds fusion, rescore
top-N) and searchAfter cursor pagination."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.rescore import bayesian_score, log_odds_fusion, rescore_topn
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ridx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=150))
    return IndexSearcher(d)


class TestSearchAfter:
    def test_pagination_covers_topk_without_overlap(self, searcher):
        full = searcher.search("spark merge", k=30, mode="exhaustive")
        page1 = searcher.search("spark merge", k=10)
        cursor = (float(page1["scores"][-1]), int(page1["docids"][-1]))
        page2 = searcher.search("spark merge", k=10, after=cursor)
        cursor2 = (float(page2["scores"][-1]), int(page2["docids"][-1]))
        page3 = searcher.search("spark merge", k=10, after=cursor2)
        got = (
            list(page1["docids"]) + list(page2["docids"]) + list(page3["docids"])
        )
        assert got == list(full["docids"])
        assert len(set(got)) == 30

    def test_after_beyond_results_empty(self, searcher):
        r = searcher.search("spark", k=10, after=(0.0, 10**9))
        assert len(r["docids"]) == 0


class TestScoringExtras:
    def test_bayesian_monotone_and_bounded(self):
        s = np.array([0.1, 0.5, 2.0, 10.0], np.float32)
        p = bayesian_score(s, alpha=2.0, beta=0.5)
        assert (np.diff(p) > 0).all()
        assert ((p > 0) & (p <= 1)).all()  # f32 sigmoid saturates at large x
        assert p[1] == pytest.approx(0.5)  # score == beta → 0.5

    def test_log_odds_fusion(self):
        a = np.array([0.9, 0.5, 0.1])
        b = np.array([0.9, 0.5, 0.9])
        f = log_odds_fusion([a, b])
        assert f[0] > 0.9  # agreement amplifies
        assert f[1] == pytest.approx(0.5)
        assert abs(f[2] - 0.5) < 1e-6  # 0.1 and 0.9 cancel

    def test_rescore_topn(self, searcher):
        first = searcher.search("spark", k=50, mode="exhaustive")

        def by_key_desc(keys, first_scores):
            return np.array(keys, dtype=np.float64)  # doc_id as score

        out = rescore_topn(first, n=50, scorer=by_key_desc, k=5)
        # top-5 by doc_id descending among the first-phase candidates
        expect = sorted(first["keys"][:50], reverse=True)[:5]
        assert out["keys"] == expect
        assert len(out["first_scores"]) == 5
