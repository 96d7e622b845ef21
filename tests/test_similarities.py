"""Pluggable similarities (Classic TF-IDF, LMDirichlet, Boolean) vs an
independent naive re-derivation of the reference's scoring math
(``ClassicSimilarity.java``, ``LMDirichletSimilarity.java``,
``BooleanSimilarity.java``) over the real sf0.001 corpus."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.codecs.smallfloat import LENGTH_TABLE, LENGTH_TABLE_INT, encode_norms
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.query import PhraseQuery, TermQuery, BooleanQuery, SHOULD
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.similarities import (
    BooleanSimilarity,
    ClassicSimilarity,
    LMDirichletSimilarity,
    similarity_for_name,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
F32 = np.float32


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("simidx"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=150))
    return d


@pytest.fixture(scope="module")
def corpus_model():
    """Naive tokenization model: per-doc token lists, doc norms bytes,
    df/ttf per term, collection stats."""
    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    an = Analyzer()
    docs = {}
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        toks, _ = an.analyze_fast(text or "")
        docs[did] = list(toks)
    lengths = {d: len(t) for d, t in docs.items()}
    nb = {
        d: int(encode_norms(np.array([n], dtype=np.int64))[0])
        for d, n in lengths.items()
    }
    df, ttf = {}, {}
    for d, toks in docs.items():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            ttf[t] = ttf.get(t, 0) + 1
    doc_count = sum(1 for n in lengths.values() if n > 0)
    sum_ttf = sum(lengths.values())
    return {
        "docs": docs,
        "nb": nb,
        "df": df,
        "ttf": ttf,
        "doc_count": doc_count,
        "sum_ttf": sum_ttf,
    }


def classic_norm_table():
    lt = LENGTH_TABLE_INT.astype(np.float64)
    table = np.zeros(256, dtype=F32)
    table[1:] = (1.0 / np.sqrt(lt[1:])).astype(F32)
    table[0] = F32(1.0) / table[255]
    return table


def naive_classic(cm, term, doc, boost=1.0):
    freq = cm["docs"][doc].count(term)
    if freq == 0:
        return None
    idf = F32(math.log((cm["doc_count"] + 1) / float(cm["df"][term] + 1)) + 1.0)
    qw = F32(boost) * idf
    tf = F32(math.sqrt(float(freq)))
    return F32(F32(tf * qw) * classic_norm_table()[cm["nb"][doc]])


def naive_lmd(cm, term, doc, boost=1.0, mu=2000.0):
    freq = cm["docs"][doc].count(term)
    if freq == 0:
        return None
    p = (cm["ttf"][term] + 1.0) / (cm["sum_ttf"] + 1.0)
    dl = float(LENGTH_TABLE[cm["nb"][doc]])
    s = float(F32(boost)) * (
        math.log(1.0 + freq / (mu * p)) + math.log(mu / (dl + mu))
    )
    return F32(max(s, 0.0))


def naive_jm(cm, term, doc, boost=1.0, lam=0.25):
    freq = cm["docs"][doc].count(term)
    if freq == 0:
        return None
    p = (cm["ttf"][term] + 1.0) / (cm["sum_ttf"] + 1.0)
    dl = float(LENGTH_TABLE[cm["nb"][doc]])
    s = float(F32(boost)) * math.log(
        1.0 + ((1.0 - lam) * freq / dl) / (lam * p)
    )
    return F32(max(s, 0.0))


TERMS = ["data", "the", "merge", "spark"]


class TestClassic:
    def test_term_scores_match_naive(self, index_dir, corpus_model):
        s = IndexSearcher(index_dir, similarity=ClassicSimilarity())
        for term in TERMS:
            r = s.search(term, k=10**9, mode="exhaustive")
            assert len(r["keys"]) > 0
            for doc, score in zip(r["keys"], r["scores"]):
                want = naive_classic(corpus_model, term, doc)
                assert score == want, (term, doc)

    def test_disjunction_sums_float32_in_clause_order(
        self, index_dir, corpus_model
    ):
        s = IndexSearcher(index_dir, similarity=ClassicSimilarity())
        q = BooleanQuery(
            clauses=[
                (SHOULD, TermQuery("data")),
                (SHOULD, TermQuery("merge")),
            ]
        )
        r = s.search(q, k=10**9, mode="exhaustive")
        assert len(r["keys"]) > 0
        for doc, score in zip(r["keys"], r["scores"]):
            acc = F32(0)
            for t in ("data", "merge"):
                w = naive_classic(corpus_model, t, doc)
                if w is not None:
                    acc = F32(acc + w)
            assert score == acc

    def test_phrase_sums_idf(self, index_dir, corpus_model):
        s = IndexSearcher(index_dir, similarity=ClassicSimilarity())
        q = PhraseQuery(terms=["order", "fast"])
        r = s.search(q, k=10**9, mode="exhaustive")
        assert len(r["keys"]) > 0
        cm = corpus_model
        idf = 0.0
        for t in ("order", "fast"):
            idf += float(
                F32(math.log((cm["doc_count"] + 1) / float(cm["df"][t] + 1)) + 1.0)
            )
        qw = F32(1.0) * F32(idf)
        table = classic_norm_table()
        for doc, score in zip(r["keys"], r["scores"]):
            toks = cm["docs"][doc]
            freq = sum(
                1
                for i in range(len(toks) - 1)
                if toks[i] == "order" and toks[i + 1] == "fast"
            )
            assert freq > 0
            tf = F32(math.sqrt(float(freq)))
            assert score == F32(F32(tf * qw) * table[cm["nb"][doc]])


class TestLMDirichlet:
    def test_term_scores_match_naive(self, index_dir, corpus_model):
        s = IndexSearcher(index_dir, similarity=LMDirichletSimilarity())
        for term in TERMS:
            r = s.search(term, k=10**9, mode="exhaustive")
            assert len(r["keys"]) > 0
            for doc, score in zip(r["keys"], r["scores"]):
                assert score == naive_lmd(corpus_model, term, doc), (term, doc)

    def test_mu_validation(self):
        with pytest.raises(ValueError):
            LMDirichletSimilarity(mu=float("nan"))


class TestLMJelinekMercer:
    def test_term_scores_match_naive(self, index_dir, corpus_model):
        from lucene_ray.search.similarities import LMJelinekMercerSimilarity

        s = IndexSearcher(
            index_dir, similarity=LMJelinekMercerSimilarity()
        )
        for term in TERMS:
            r = s.search(term, k=10**9, mode="exhaustive")
            assert len(r["keys"]) > 0
            for doc, score in zip(r["keys"], r["scores"]):
                assert score == naive_jm(corpus_model, term, doc), (term, doc)

    def test_lambda_validation(self):
        from lucene_ray.search.similarities import LMJelinekMercerSimilarity

        for bad in (0.0, -0.5, 1.5, float("nan")):
            with pytest.raises(ValueError):
                LMJelinekMercerSimilarity(lam=bad)


def naive_dfr_inl2(cm, term, doc, boost=1.0):
    freq = cm["docs"][doc].count(term)
    if freq == 0:
        return None
    N = cm["doc_count"]
    n = cm["df"][term]
    avgdl = cm["sum_ttf"] / float(N)
    dl = float(LENGTH_TABLE[cm["nb"][doc]])
    log2 = math.log(2.0)
    tfn = freq * (math.log(1.0 + avgdl / dl) / log2)
    a = math.log((N + 1) / (n + 0.5)) / log2
    s = float(F32(boost)) * (a * 1.0 * (1.0 - 1.0 / (1.0 + tfn)))
    return F32(max(s, 0.0))


class TestDFRInL2:
    def test_term_scores_match_naive(self, index_dir, corpus_model):
        from lucene_ray.search.similarities import DFRInL2Similarity

        s = IndexSearcher(index_dir, similarity=DFRInL2Similarity())
        for term in TERMS:
            r = s.search(term, k=10**9, mode="exhaustive")
            assert len(r["keys"]) > 0
            for doc, score in zip(r["keys"], r["scores"]):
                assert score == naive_dfr_inl2(corpus_model, term, doc), (
                    term,
                    doc,
                )


class TestBoolean:
    def test_scores_equal_boost(self, index_dir):
        s = IndexSearcher(index_dir, similarity=BooleanSimilarity())
        r = s.search(TermQuery("data", boost=2.5), k=10**9, mode="exhaustive")
        assert len(r["keys"]) > 0
        assert all(sc == F32(2.5) for sc in r["scores"])


class TestPlumbing:
    def test_registry(self):
        assert isinstance(similarity_for_name("tfidf"), ClassicSimilarity)
        assert isinstance(similarity_for_name("classic"), ClassicSimilarity)
        assert isinstance(
            similarity_for_name("lmdirichlet", mu=500.0), LMDirichletSimilarity
        )
        with pytest.raises(ValueError, match="unknown similarity"):
            similarity_for_name("nope")

    def test_searcher_accepts_name_string(self, index_dir):
        s = IndexSearcher(index_dir, similarity="classic")
        assert isinstance(s.sim, ClassicSimilarity)
        assert not s.is_bm25

    def test_wand_mode_rejected_for_non_bm25(self, index_dir):
        s = IndexSearcher(index_dir, similarity="classic")
        with pytest.raises(ValueError, match="BM25"):
            s.search("data merge", k=10, mode="wand")

    def test_auto_mode_equals_exhaustive_for_non_bm25(self, index_dir):
        s = IndexSearcher(index_dir, similarity="lmdirichlet")
        a = s.search("data merge spark", k=10)
        b = s.search("data merge spark", k=10, mode="exhaustive")
        assert list(a["docids"]) == list(b["docids"])
        assert np.array_equal(a["scores"], b["scores"])

    def test_bm25_unaffected(self, index_dir):
        """Default similarity still takes the pruned path and matches
        exhaustive rank/scores (guards the refactor)."""
        s = IndexSearcher(index_dir)
        assert s.is_bm25
        a = s.search("data merge", k=10)
        b = s.search("data merge", k=10, mode="exhaustive")
        assert list(a["docids"]) == list(b["docids"])
        assert np.array_equal(a["scores"], b["scores"])


class TestKeywordFieldGeneric:
    def test_classic_keyword_norm_byte_one(self, ray_session, tmp_path_factory):
        """Norms-omitted keyword field scores with norm byte 1 (length 1 →
        lengthNorm 1.0): score = tf * idf over the FIELD's stats."""
        d = str(tmp_path_factory.mktemp("kwidx"))
        build_index(
            DOCS,
            d,
            IndexConfig(rows_per_segment=150, keyword_cols=("lang",)),
        )
        s = IndexSearcher(d, similarity="classic")
        r = s.search(TermQuery("en", field="lang"), k=10**9, mode="exhaustive")
        assert len(r["keys"]) > 0
        tbl = pq.read_table(DOCS, columns=["doc_id", "lang"])
        langs = dict(
            zip(tbl.column("doc_id").to_pylist(), tbl.column("lang").to_pylist())
        )
        n_en = sum(1 for v in langs.values() if v == "en")
        doc_count = len(langs)  # every doc has a lang value
        idf = F32(math.log((doc_count + 1) / float(n_en + 1)) + 1.0)
        want = F32(F32(F32(1.0) * idf) * classic_norm_table()[1])  # tf=sqrt(1)
        assert {int(k) for k in r["keys"]} == {
            k for k, v in langs.items() if v == "en"
        }
        assert all(sc == want for sc in r["scores"])
