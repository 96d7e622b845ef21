"""End-to-end: build a multi-segment index over real testdata, search, and
verify rank/score-identical results against an independent brute-force
oracle (exhaustive float32 BM25 computed without any index machinery).

This is the SURVEY §5 "end-to-end rank-identical" gate at sf-small.
"""

import json
import math
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.codecs.smallfloat import encode_norms
from lucene_ray.index.build import build_index, plan_partitions
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import load_manifest
from lucene_ray.search.bm25 import BM25Similarity
from lucene_ray.search.searcher import IndexSearcher, search_dataset

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")

F32 = np.float32


@pytest.fixture(scope="module")
def corpus():
    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    keys = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    a = Analyzer()
    term_lists = [a.analyze_fast(t)[0] for t in texts]
    lengths = np.array([len(t) for t in term_lists], dtype=np.int64)
    return {
        "keys": keys,
        "texts": texts,
        "terms": term_lists,
        "lengths": lengths,
        "norms": encode_norms(lengths),
        "doc_count": int((lengths > 0).sum()),
        "sum_ttf": int(lengths.sum()),
    }


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    cfg = IndexConfig(rows_per_segment=150, num_buckets=2)  # → 4 segments
    build_index(DOCS, d, cfg)
    return d


def oracle_term_scores(corpus, term):
    """Exhaustive float32 BM25 for one term, same algebra as the engine."""
    sim = BM25Similarity()
    df = sum(1 for terms in corpus["terms"] if term in terms)
    if df == 0:
        return {}
    sc = sim.scorer(1.0, corpus["doc_count"], corpus["sum_ttf"], df)
    out = {}
    for i, terms in enumerate(corpus["terms"]):
        tf = terms.count(term)
        if tf:
            s = sc.score(np.array([tf], F32), corpus["norms"][i : i + 1])
            out[i] = F32(s[0])
    return out


def oracle_topk(scores_by_doc, k=10):
    rows = sorted(((-float(s), d) for d, s in scores_by_doc.items()))
    return [(d, -ns) for ns, d in rows[:k]]


class TestBuild:
    def test_plan_partitions_deterministic(self):
        p1 = plan_partitions([DOCS], 150)
        p2 = plan_partitions([DOCS], 150)
        assert p1 == p2
        assert [x["base_docid"] for x in p1] == [0, 150, 300, 450]

    def test_manifest_stats_match_recount(self, index_dir, corpus):
        man = load_manifest(index_dir)
        assert man.field_stats["doc_count"] == corpus["doc_count"]
        assert man.field_stats["sum_ttf"] == corpus["sum_ttf"]
        assert man.total_docs == len(corpus["keys"])
        assert len(man.segments) == 4

    def test_segment_checksums_and_metrics(self, index_dir):
        man = load_manifest(index_dir)
        for s in man.segments:
            assert s["metrics"]["docs_per_s"] > 0
            assert "norms.bin" in s["checksums"]
            assert s["lineage"]["path"] == DOCS


class TestSearchRankIdentical:
    @pytest.mark.parametrize("term", ["spark", "merge", "the", "vector", "customer"])
    def test_single_term_scores_bit_identical(self, index_dir, corpus, term):
        s = IndexSearcher(index_dir)
        res = s.search(term, k=10)
        expect = oracle_topk(oracle_term_scores(corpus, term))
        assert len(res["docids"]) == len(expect)
        for i, (doc, score) in enumerate(expect):
            assert int(res["docids"][i]) == doc  # docid == row index here
            assert F32(res["scores"][i]) == F32(score), (term, i)
        # keys map back to original doc ids
        assert res["keys"] == [corpus["keys"][d] for d, _ in expect]

    def test_missing_term(self, index_dir):
        s = IndexSearcher(index_dir)
        res = s.search("zzzznotaterm", k=10)
        assert len(res["docids"]) == 0 and res["total_hits"] == 0

    def test_disjunction_sum_matches_oracle(self, index_dir, corpus):
        s = IndexSearcher(index_dir)
        res = s.search("spark merge", k=10)
        s1 = oracle_term_scores(corpus, "spark")
        s2 = oracle_term_scores(corpus, "merge")
        combined = {}
        for d in set(s1) | set(s2):
            acc = F32(0.0)
            if d in s1:
                acc = acc + s1[d]
            if d in s2:
                acc = acc + s2[d]
            combined[d] = acc
        expect = oracle_topk(combined)
        got = list(zip(res["docids"], res["scores"]))
        for (ed, es), (gd, gs) in zip(expect, got):
            assert int(gd) == ed and F32(gs) == F32(es)

    def test_conjunction_and_negation(self, index_dir, corpus):
        s = IndexSearcher(index_dir)
        res = s.search("+spark +merge -window", k=1000)
        match = {
            i
            for i, t in enumerate(corpus["terms"])
            if "spark" in t and "merge" in t and "window" not in t
        }
        assert set(int(d) for d in res["docids"][: len(match)]) <= match
        assert res["total_hits"] == len(match)

    def test_phrase_query(self, index_dir, corpus):
        # find a bigram that actually occurs
        bigram = None
        for terms in corpus["terms"]:
            if len(terms) >= 2:
                bigram = (terms[0], terms[1])
                break
        qtext = f'"{bigram[0]} {bigram[1]}"'
        s = IndexSearcher(index_dir)
        res = s.search(qtext, k=1000)
        expect = {
            i
            for i, t in enumerate(corpus["terms"])
            if any(t[j] == bigram[0] and t[j + 1] == bigram[1] for j in range(len(t) - 1))
        }
        assert res["total_hits"] == len(expect)
        assert set(int(d) for d in res["docids"]) <= expect or len(expect) > 1000

    def test_tie_break_lower_docid_first(self, index_dir):
        s = IndexSearcher(index_dir)
        res = s.search("spark", k=500)
        pairs = list(zip(res["scores"], res["docids"]))
        for (s1, d1), (s2, d2) in zip(pairs, pairs[1:]):
            assert (s1 > s2) or (s1 == s2 and d1 < d2)


class TestResume:
    def test_resume_skips_completed(self, ray_session, tmp_path, corpus):
        d = str(tmp_path / "idx2")
        cfg = IndexConfig(rows_per_segment=150, num_buckets=1)
        man1 = build_index(DOCS, d, cfg)
        # delete one segment, manifest stays; rebuild must restore only it
        seg_dirs = sorted(os.listdir(os.path.join(d, "segments")))
        removed = os.path.join(d, "segments", "seg_000002")
        shutil.rmtree(removed)
        man2 = build_index(DOCS, d, cfg)
        assert man2.generation == man1.generation + 1
        assert man2.field_stats == man1.field_stats
        # results identical to a fresh index
        s = IndexSearcher(d)
        res = s.search("spark", k=5)
        assert len(res["docids"]) == 5

    def test_partial_build_then_resume_identical(self, ray_session, tmp_path):
        d_full = str(tmp_path / "full")
        d_resume = str(tmp_path / "resumed")
        cfg = IndexConfig(rows_per_segment=200, num_buckets=1)
        build_index(DOCS, d_full, cfg)
        # simulate a crashed run: build only partition 0 by hand
        from lucene_ray.index.build import build_partition, plan_partitions

        plan = plan_partitions([DOCS], 200)
        os.makedirs(os.path.join(d_resume, "segments"), exist_ok=True)
        build_partition(plan[0], cfg, d_resume)
        assert not os.path.exists(os.path.join(d_resume, "manifest.json"))
        build_index(DOCS, d_resume, cfg)  # resume completes the rest
        m_full = load_manifest(d_full)
        m_res = load_manifest(d_resume)
        assert [s["checksums"] for s in m_full.segments] == [
            s["checksums"] for s in m_res.segments
        ]


class TestDistributedSearch:
    def test_search_dataset_actor_pool(self, index_dir, ray_session):
        import ray.data

        queries = ray.data.from_items(
            [{"qid": 0, "query": "spark"}, {"qid": 1, "query": "merge table"}]
        )
        out = search_dataset(index_dir, queries, k=5, concurrency=2).to_pandas()
        assert set(out["qid"]) == {0, 1}
        assert (out.groupby("qid")["rank"].max() == 4).all()
        direct = IndexSearcher(index_dir).search("spark", k=5)
        got = out[out.qid == 0].sort_values("rank")
        assert list(got["docid"]) == list(direct["docids"])
