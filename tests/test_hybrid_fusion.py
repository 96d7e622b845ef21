"""Hybrid BM25+KNN log-odds fusion (fork RescoreTopNQuery +
BayesianScoreQuery + LogOddsFusionQuery composition): engine vs DuckDB
oracle, and fusion-math properties."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_ray.pipelines.search_queries import (
    FUSION_K,
    FUSION_N,
    hybrid_fusion,
    sql_hybrid_fusion,
)

SF = "/root/testdata/sf0.001"
TABLES = ("documents", "embeddings")


class TestOracleParity:
    def test_matches_duckdb(self, ray_session):
        got = hybrid_fusion(SF).to_pandas()
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"create view {t} as select * from '{SF}/{t}.parquet'"
            )
        want = con.sql(sql_hybrid_fusion()).df()
        got = got.sort_values("rank").reset_index(drop=True)
        want = want.sort_values("rank").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"rank": "int64"}), want.astype({"rank": "int64"})
        )
        assert len(got) == FUSION_K

    def test_fused_order_and_bounds(self, ray_session):
        got = hybrid_fusion(SF).to_pandas()
        m = got["fused_micro"].to_numpy()
        assert (np.diff(m) <= 0).all()  # ranked by fused desc
        # log-odds of two clamped probabilities: |L| <= 2*ln((1-eps)/eps)
        lim = 2 * np.log((1 - 1e-6) / 1e-6) * 1e6
        assert (np.abs(m) <= lim).all()


class TestFusionMath:
    def test_monotone_in_each_component(self):
        from lucene_ray.search.rescore import bayesian_score, log_odds_fusion

        bm25 = np.array([1.0, 1.0], dtype=np.float32)
        cos = np.array([0.2, 0.9], dtype=np.float32)
        p_t = bayesian_score(bm25, 0.8, 2.0)
        p_v = bayesian_score(cos, 3.0, 0.5)
        fused = log_odds_fusion([p_t, p_v])
        assert fused[1] > fused[0]  # higher cosine wins at equal bm25

    def test_clamp_saturation(self):
        from lucene_ray.search.rescore import log_odds_fusion

        p = np.array([0.0, 1.0], dtype=np.float64)
        f = log_odds_fusion([p])
        assert 0.0 < f[0] < f[1] < 1.0  # eps clamp keeps both finite
