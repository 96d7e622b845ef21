"""Unigram LM perplexity scoring (CCNet-style quality gate): the
vectorized per-batch NLL must equal a brute-force Python reference, and
the integer micro-nat quantization must be order-free."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.lm_score import (
    KEEP_NATS_MICRO,
    SCALE,
    lm_perplexity,
    lm_train,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def model(ray_session):
    return lm_train(SF)


@pytest.fixture(scope="module")
def corpus():
    return pq.read_table(DOCS, columns=["doc_id", "text"])


class TestLmTrain:
    def test_counts_and_quantization(self, model, corpus):
        vocab, lp, unseen = model
        # brute-force counts
        cnt = {}
        for t in corpus.column("text").to_pylist():
            for w in (t or "").split(" "):
                if w:
                    cnt[w] = cnt.get(w, 0) + 1
        assert set(vocab) == set(cnt)
        denom = sum(cnt.values()) + len(cnt)
        for w, c in list(cnt.items())[:200]:
            want = math.floor(math.log((c + 1) / denom) * SCALE + 0.5)
            assert lp[vocab[w]] == want
        assert unseen == math.floor(math.log(1.0 / denom) * SCALE + 0.5)

    def test_logprobs_negative_and_monotone(self, model):
        vocab, lp, unseen = model
        assert (lp < 0).all()
        assert unseen <= lp.min()  # unseen is the least probable


class TestLmPerplexity:
    def test_nll_vs_bruteforce(self, ray_session, model, corpus):
        vocab, lp, unseen = model
        got = lm_perplexity(SF).to_pandas().set_index("doc_id")
        for d, t in zip(
            corpus.column("doc_id").to_pylist(),
            corpus.column("text").to_pylist(),
        ):
            words = [w for w in (t or "").split(" ") if w]
            nll = sum(-int(lp[vocab[w]]) for w in words)
            row = got.loc[d]
            assert row["n_words"] == len(words)
            assert row["nll_micro_nats"] == nll
            keep = len(words) > 0 and nll <= KEEP_NATS_MICRO * len(words)
            assert bool(row["keep"]) == keep

    def test_keep_flag_discriminates(self, ray_session):
        df = lm_perplexity(SF).to_pandas()
        frac = df["keep"].mean()
        assert 0.05 < frac < 0.95  # threshold splits the corpus
