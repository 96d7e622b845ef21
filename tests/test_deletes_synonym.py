"""Deletes / live docs (generational tombstones) + SynonymQuery."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.deletes import delete_by_keys, delete_by_query
from lucene_ray.index.merge import force_merge
from lucene_ray.search.query import SynonymQuery
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def fresh_index(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    build_index(DOCS, d, IndexConfig(rows_per_segment=150))
    return d


class TestDeletes:
    def test_deleted_docs_vanish_scores_unchanged(self, fresh_index):
        s0 = IndexSearcher(fresh_index)
        before = s0.search("data", k=10**9, mode="exhaustive")
        victims = [int(d) for d in before["keys"][:5]]
        delete_by_keys(fresh_index, victims)
        s1 = IndexSearcher(fresh_index)
        after = s1.search("data", k=10**9, mode="exhaustive")
        # live matches = before minus victims, scores bit-identical
        # (stats keep deleted docs until compaction — reference behavior)
        want = [
            (k, sc)
            for k, sc in zip(before["keys"], before["scores"])
            if k not in set(victims)
        ]
        assert list(zip(after["keys"], after["scores"])) == want
        assert after["total_hits"] == before["total_hits"] - 5

    def test_wand_path_respects_deletes(self, fresh_index):
        s0 = IndexSearcher(fresh_index)
        top = s0.search("data merge", k=3)
        delete_by_keys(fresh_index, [int(top["keys"][0])])
        s1 = IndexSearcher(fresh_index)
        pruned = s1.search("data merge", k=10)
        exact = s1.search("data merge", k=10, mode="exhaustive")
        assert int(top["keys"][0]) not in pruned["keys"]
        assert list(pruned["docids"]) == list(exact["docids"])
        assert np.array_equal(pruned["scores"], exact["scores"])

    def test_delete_accumulates_generations(self, fresh_index):
        delete_by_keys(fresh_index, [0, 1])
        delete_by_keys(fresh_index, [2])
        s = IndexSearcher(fresh_index)
        r = s.search("the", k=10**9, mode="exhaustive")
        assert not {0, 1, 2} & set(r["keys"])

    def test_delete_by_query(self, fresh_index):
        delete_by_query(fresh_index, "spark")
        s = IndexSearcher(fresh_index)
        assert len(s.search("spark", k=5)["keys"]) == 0
        # docs without 'spark' still searchable
        assert len(s.search("the", k=5)["keys"]) > 0

    def test_merge_carries_tombstones(self, fresh_index):
        delete_by_keys(fresh_index, [3, 7, 11])
        s0 = IndexSearcher(fresh_index)
        before = s0.search("the", k=10**9, mode="exhaustive")
        force_merge(fresh_index, 1)
        s1 = IndexSearcher(fresh_index)
        after = s1.search("the", k=10**9, mode="exhaustive")
        assert list(before["keys"]) == list(after["keys"])
        assert np.array_equal(before["scores"], after["scores"])
        assert not {3, 7, 11} & set(after["keys"])

    def test_idempotent_no_new_generation(self, fresh_index):
        import os

        m1 = delete_by_keys(fresh_index, [4])
        seg0 = os.path.join(fresh_index, "segments", "seg_000000")
        gens1 = sorted(f for f in os.listdir(seg0) if f.startswith("deleted_"))
        delete_by_keys(fresh_index, [4])  # same set again
        gens2 = sorted(f for f in os.listdir(seg0) if f.startswith("deleted_"))
        assert gens1 == gens2
        assert m1.segments[0]["del_count"] >= 0


class TestSynonymQuery:
    def test_pseudo_term_scoring(self, fresh_index):
        corpus = pq.read_table(DOCS, columns=["doc_id", "text"])
        texts = {
            int(d): (t or "").split()
            for d, t in zip(
                corpus.column("doc_id").to_pylist(),
                corpus.column("text").to_pylist(),
            )
        }
        s = IndexSearcher(fresh_index)
        terms = ("batch", "stream")
        r = s.search(SynonymQuery(terms), k=10**9, mode="exhaustive")
        # match set = union of term matches
        want = sorted(
            d for d, toks in texts.items() if any(t in toks for t in terms)
        )
        assert sorted(r["keys"]) == want
        # freqs sum + pseudo df = max variant df: check one doc's score
        dfs = [sum(1 for t in texts.values() if term in t) for term in terms]
        df = max(dfs)
        n = s.doc_count
        w = np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5)))
        d0 = r["keys"][0]
        tf = sum(texts[d0].count(t) for t in terms)
        from lucene_ray.codecs.smallfloat import encode_norms

        nb = encode_norms(np.array([len(texts[d0])]))[0]
        inv = s.norm_inverse[nb]
        want_score = w - w / (np.float32(1.0) + np.float32(tf) * inv)
        assert r["scores"][0] == want_score

    def test_single_term_synonym_equals_term(self, fresh_index):
        s = IndexSearcher(fresh_index)
        a = s.search(SynonymQuery(("data",)), k=20, mode="exhaustive")
        b = s.search("data", k=20, mode="exhaustive")
        assert list(a["docids"]) == list(b["docids"])
        assert np.array_equal(a["scores"], b["scores"])
