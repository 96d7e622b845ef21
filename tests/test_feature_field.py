"""FeatureField / fork DOCS_AND_CUSTOM_FREQS: custom freqs in the
postings freq slot, the four FeatureField scoring functions
(``core/document/FeatureField.java``), survival through merges, and the
float-exact oracle algebra."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.codecs.feature import (
    MAX_FREQ,
    MIN_NORMAL,
    decode_feature_values,
    encode_feature_values,
    feature_scores,
)
from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index
from lucene_ray.index.config import FEATURE_FIELD, IndexConfig, term_key
from lucene_ray.index.merge import force_merge
from lucene_ray.search.query import (
    SHOULD,
    BooleanQuery,
    FeatureQuery,
    TermQuery,
    query_terms,
)
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

CFG = IndexConfig(
    rows_per_segment=150,
    feature_cols=("n_chars",),
    dv_cols=("n_chars",),
)


@pytest.fixture(scope="module")
def corpus():
    return pq.read_table(DOCS)


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("featidx"))
    build_index(DOCS, d, CFG)
    return d


@pytest.fixture(scope="module")
def searcher(index_dir):
    return IndexSearcher(index_dir)


class TestEncoding:
    def test_roundtrip_exact_below_9_bits(self):
        # integers < 2^9 and any float with <= 9 significant bits are exact
        vals = np.array([1, 2, 47, 200, 511, 0.25, 0.75, 1.5], np.float32)
        assert np.array_equal(
            decode_feature_values(encode_feature_values(vals)), vals
        )

    def test_quantization_truncates(self):
        # 513 has 10 significant bits -> truncated DOWN to 512
        got = decode_feature_values(encode_feature_values([513.0]))
        assert got[0] == 512.0

    @given(
        st.floats(
            min_value=MIN_NORMAL,
            max_value=float(np.finfo(np.float32).max),
            width=32,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_decode_is_truncation(self, v):
        # decode(encode(v)) <= v, and within one 9-bit ulp below
        d = float(decode_feature_values(encode_feature_values([v]))[0])
        assert d <= v
        # relative error bounded by 2^-8 (FeatureField javadoc :59-61)
        assert (v - d) <= max(v * 2 ** -8, 0.0) or d == v

    def test_rejects_bad_values(self):
        for bad in (0.0, -1.0, float("nan"), float("inf"), MIN_NORMAL / 2):
            with pytest.raises(ValueError):
                encode_feature_values([bad])

    def test_max_freq_saturates(self):
        # FeatureField.decodeFeatureValue: freq > MAX_FREQ -> MAX_VALUE
        out = decode_feature_values(np.array([MAX_FREQ + 1], np.uint32))
        assert out[0] == np.finfo(np.float32).max


class TestScoringFunctions:
    def test_linear(self):
        f = np.array([100.0, 256.0], np.float32)
        got = feature_scores("linear", f, weight=0.5)
        assert np.array_equal(got, np.float32(0.5) * f)

    def test_log_matches_java_op_order(self):
        f = np.array([100.0], np.float32)
        got = feature_scores("log", f, weight=0.5, scale=1.0)
        want = np.float32(np.float64(0.5) * math.log(float(np.float32(1.0) + np.float32(100.0))))
        assert got[0] == want

    def test_satu_algebraic_form(self):
        # w * (1 - k/(S+k)), NOT w*S/(S+k) — float32 equality depends on it
        f = np.array([150.0], np.float32)
        got = feature_scores("satu", f, weight=2.0, pivot=200.0)
        p = np.float32(200.0)
        want = np.float32(2.0) * (np.float32(1.0) - p / (f[0] + p))
        assert got[0] == want

    def test_sigmoid_double_path(self):
        f = np.array([300.0], np.float32)
        got = feature_scores("sigmoid", f, weight=2.0, pivot=300.0, exp=1.5)
        # S == pivot -> exactly w/2
        assert got[0] == np.float32(1.0)

    def test_monotone_increasing(self):
        # all four functions are monotone in S — the impact/WAND premise
        f = np.sort(
            np.abs(np.random.RandomState(7).randn(50)).astype(np.float32) + 1
        )
        for fn in ("linear", "log", "satu", "sigmoid"):
            s = feature_scores(fn, f, weight=2.0, pivot=3.0, scale=1.0, exp=1.5)
            assert np.all(np.diff(s) >= 0), fn


class TestIndexed:
    def test_check_index_clean(self, index_dir):
        check_index(index_dir)

    def test_feature_matches_all_docs_with_value(self, searcher, corpus):
        q = FeatureQuery("n_chars", "linear", weight=1.0)
        r = searcher.search(q, k=10**9, mode="exhaustive")
        assert sorted(r["keys"]) == sorted(corpus.column("doc_id").to_pylist())

    def test_scores_equal_quantized_value(self, searcher, corpus):
        q = FeatureQuery("n_chars", "linear", weight=1.0)
        r = searcher.search(q, k=10**9, mode="exhaustive")
        want = {
            d: float(decode_feature_values(encode_feature_values([float(n)]))[0])
            for d, n in zip(
                corpus.column("doc_id").to_pylist(),
                corpus.column("n_chars").to_pylist(),
            )
        }
        for key, sc in zip(r["keys"], r["scores"]):
            assert float(sc) == want[key]

    def test_no_norms_no_length_contribution(self, searcher, index_dir):
        # feature postings must not perturb text-field BM25: same query,
        # same scores as an index without feature_cols
        import tempfile

        plain = tempfile.mkdtemp()
        build_index(DOCS, plain, IndexConfig(rows_per_segment=150))
        s2 = IndexSearcher(plain)
        r1 = searcher.search("data", k=10)
        r2 = s2.search("data", k=10)
        assert r1["keys"] == r2["keys"]
        assert np.array_equal(r1["scores"], r2["scores"])

    def test_boolean_combination_sum_order(self, searcher, corpus):
        q = BooleanQuery(
            (
                (SHOULD, TermQuery("data")),
                (SHOULD, FeatureQuery("n_chars", "satu", weight=2.0, pivot=200.0)),
            )
        )
        r = searcher.search(q, k=10)
        # every returned score >= the pure feature floor (text adds >= 0)
        txt = searcher.search("data", k=10**9, mode="exhaustive")
        tmap = dict(zip(txt["keys"], txt["scores"]))
        feats = searcher.search(
            FeatureQuery("n_chars", "satu", weight=2.0, pivot=200.0),
            k=10**9,
            mode="exhaustive",
        )
        fmap = dict(zip(feats["keys"], feats["scores"]))
        for key, sc in zip(r["keys"], r["scores"]):
            want = np.float32(0.0) + np.float32(tmap.get(key, 0.0))
            want = want + np.float32(fmap[key])
            assert float(sc) == float(want)

    def test_query_terms_key(self):
        q = FeatureQuery("n_chars", "satu")
        assert query_terms(q) == [term_key(FEATURE_FIELD, "n_chars")]

    def test_survives_force_merge(self, index_dir, corpus, tmp_path):
        import shutil

        d = str(tmp_path / "merged")
        shutil.copytree(index_dir, d)
        force_merge(d)
        s = IndexSearcher(d)
        q = FeatureQuery("n_chars", "linear", weight=1.0)
        r = s.search(q, k=10**9, mode="exhaustive")
        want = {
            dd: float(decode_feature_values(encode_feature_values([float(n)]))[0])
            for dd, n in zip(
                corpus.column("doc_id").to_pylist(),
                corpus.column("n_chars").to_pylist(),
            )
        }
        assert sorted(r["keys"]) == sorted(want)
        for key, sc in zip(r["keys"], r["scores"]):
            assert float(sc) == want[key]
