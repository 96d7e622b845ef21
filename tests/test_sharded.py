"""Shard-partitioned query tier (search.sharded): bit-exact equality vs
the replica tier across query types and shard counts — the property the
design rests on (disjoint segment ownership + global stats exchange +
TopDocs.merge ⇒ identical ranking; ``core/search/TopDocs.java:203-228``).
"""

import shutil

import numpy as np
import pytest

DOCS = "/root/testdata/sf0.01/documents.parquet"

QUERIES = [
    ("q_term", "data"),
    ("q_disj", "the data"),
    ("q_conj", "+data +search"),
    ("q_neg", "data -the"),
    ("q_phrase", '"the data"'),
    ("q_multi", "information retrieval systems"),
    ("q_absent", "zzzabsent"),
]

COLS = ["qid", "rank", "key", "docid", "score"]


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from lucene_ray.index.build import build_index
    from lucene_ray.index.config import IndexConfig

    d = str(tmp_path_factory.mktemp("shardidx") / "idx")
    build_index(DOCS, d, IndexConfig(rows_per_segment=50))  # 10 segments
    return d


@pytest.fixture(scope="module")
def replica_result(ray_session, index_dir):
    import ray.data

    from lucene_ray.search.searcher import search_dataset

    qds = ray.data.from_items([{"qid": q, "query": t} for q, t in QUERIES])
    return (
        search_dataset(index_dir, qds, k=10)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )


class TestShardedEqualsReplica:
    @pytest.mark.parametrize("n_shards", [1, 2, 3, 7])
    def test_bit_exact_ranking(self, ray_session, index_dir, replica_result, n_shards):
        import ray.data

        from lucene_ray.search.sharded import search_dataset_sharded

        qds = ray.data.from_items(
            [{"qid": q, "query": t} for q, t in QUERIES]
        )
        sh = (
            search_dataset_sharded(index_dir, qds, k=10, n_shards=n_shards)
            .to_pandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        assert replica_result[COLS].equals(sh[COLS])

    def test_merged_totals_exact_for_exhaustive(self, ray_session, index_dir):
        """Conjunction queries run the exhaustive path (exact totals);
        the merged total must equal the replica searcher's."""
        import ray.data

        from lucene_ray.search.searcher import IndexSearcher
        from lucene_ray.search.sharded import search_dataset_sharded

        s = IndexSearcher(index_dir)
        want = s.search("+the +data", k=10)["total_hits"]
        assert want > 0  # else the assertion below is vacuous
        qds = ray.data.from_items([{"qid": 0, "query": "+the +data"}])
        sh = search_dataset_sharded(index_dir, qds, k=10, n_shards=3).to_pandas()
        assert len(sh) > 0
        assert (sh["total_hits"] == want).all()


class TestShardPlan:
    def test_disjoint_and_complete(self, ray_session, index_dir):
        from lucene_ray.index.manifest import load_manifest
        from lucene_ray.search.sharded import shard_plan

        man = load_manifest(index_dir)
        all_ids = {int(s["seg_id"]) for s in man.segments}
        plan = shard_plan(index_dir, 3)
        got = [i for p in plan for i in p]
        assert len(got) == len(set(got))  # disjoint
        assert set(got) == all_ids  # complete

    def test_more_shards_than_segments(self, ray_session, index_dir):
        from lucene_ray.index.manifest import load_manifest
        from lucene_ray.search.sharded import shard_plan

        man = load_manifest(index_dir)
        plan = shard_plan(index_dir, 10 * len(man.segments))
        assert len(plan) <= len(man.segments)


class TestShardSearcherIsolation:
    def test_shard_opens_only_owned_segments(self, ray_session, index_dir):
        from lucene_ray.search.searcher import IndexSearcher
        from lucene_ray.search.sharded import shard_plan

        plan = shard_plan(index_dir, 3)
        sh = IndexSearcher(index_dir, segment_ids=plan[0])
        full = IndexSearcher(index_dir)
        assert len(sh.segments) == len(plan[0]) < len(full.segments)
        # collection stats stay manifest-global in shard mode
        assert sh.doc_count == full.doc_count
        assert sh.sum_ttf == full.sum_ttf

    def test_stats_override_reproduces_global_scores(self, ray_session, index_dir):
        from lucene_ray.search.query import parse_query, query_terms
        from lucene_ray.search.searcher import IndexSearcher
        from lucene_ray.search.sharded import shard_plan

        full = IndexSearcher(index_dir)
        terms = query_terms(parse_query("the data", full.analyzer))
        st = full.term_states(terms)
        ov = {t: (st[t][1], st[t][2]) for t in st}

        plan = shard_plan(index_dir, 2)
        merged = []
        for p in plan:
            sh = IndexSearcher(index_dir, segment_ids=p)
            sh.stats_override = ov
            r = sh.search("the data", k=10)
            merged.extend(
                zip(-r["scores"].astype(np.float64), r["docids"], r["keys"])
            )
        merged.sort()
        want = full.search("the data", k=10)
        got_keys = [k for _, _, k in merged[:10]]
        assert got_keys == list(want["keys"])
        got_scores = np.array([-s for s, _, _ in merged[:10]], dtype=np.float32)
        assert np.array_equal(got_scores, want["scores"])


class TestChunkedExchange:
    def test_chunked_equals_one_shot(self, ray_session, index_dir, replica_result):
        """chunk_queries smaller than the stream forces the per-chunk
        phase-0/1 path; results must be identical to the one-shot
        exchange (per-term stats depend only on the index)."""
        import ray.data

        from lucene_ray.search.sharded import search_dataset_sharded

        qds = ray.data.from_items(
            [{"qid": q, "query": t} for q, t in QUERIES]
        )
        sh = (
            search_dataset_sharded(
                index_dir, qds, k=10, n_shards=3, chunk_queries=2
            )
            .to_pandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        assert replica_result[COLS].equals(sh[COLS])
