"""Regression tests for the round-2 ADVICE findings:

1. knn_classify scratch cache key includes the embeddings file mtime —
   regenerating embeddings.parquet in place (same row count) must not
   silently reuse stale normalized blocks/labels.
2. export_matches resume markers are query-scoped — a partition written
   by a previous export with a DIFFERENT query into the same out_dir is
   discarded, not counted as done.
3. dedup_components label propagation uses pointer jumping — chain-shaped
   duplicate clusters with eccentricity > max_rounds still converge.
4. search_sorted on a string-index-sorted index routes through the
   ordinal/str_sort path instead of the numeric early-exit (which raised
   TypeError descending and skipped the string merge ascending).
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _write_embeddings(path: str, labels: np.ndarray) -> None:
    rng = np.random.default_rng(7)
    n, dim = len(labels), 8
    emb = rng.normal(size=(n, dim))
    # opposite directions along dim0 so COSINE neighbors are label-determined
    emb[:, 0] += (labels * 2.0 - 1.0) * 50.0
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb.astype(np.float64)), pa.list_(pa.float64())),
            "label": pa.array(labels.astype(np.int64)),
        }
    )
    pq.write_table(t, path)


class TestKnnClassifyCacheInvalidation:
    def test_regenerated_embeddings_not_stale(self, ray_session, tmp_path):
        from lucene_ray.pipelines.classify import knn_classify

        sf = str(tmp_path)
        path = os.path.join(sf, "embeddings.parquet")
        labels_a = np.array([0] * 10 + [1] * 10)
        _write_embeddings(path, labels_a)
        a = knn_classify(sf, k=3).to_pandas()
        assert set(a["label_pred"]) == {0, 1}

        # regenerate IN PLACE: same row count, flipped labels, bumped mtime
        _write_embeddings(path, 1 - labels_a)
        os.utime(path, (os.path.getmtime(path) + 5, os.path.getmtime(path) + 5))
        b = knn_classify(sf, k=3).to_pandas()
        merged = a.merge(b, on="vec_id", suffixes=("_old", "_new"))
        assert (merged["label_pred_new"] == 1 - merged["label_pred_old"]).all()


class TestExportQueryScopedResume:
    def test_different_query_partitions_discarded(self, ray_session, tmp_path):
        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig
        from lucene_ray.pipelines.export import export_matches

        idx = str(tmp_path / "idx")
        build_index(DOCS, idx, IndexConfig(rows_per_segment=200))

        out = str(tmp_path / "exp")
        n_a = export_matches(idx, "data", out)
        # re-run same query: resume path counts finished partitions
        assert export_matches(idx, "data", out) == n_a

        fresh = str(tmp_path / "exp_fresh")
        n_b_fresh = export_matches(idx, "search", fresh)
        # different query into the SAME dir must not reuse query-A partitions
        n_b = export_matches(idx, "search", out)
        assert n_b == n_b_fresh
        assert n_b != n_a  # distinct match sets, else the test is vacuous


class TestPointerJumpingChain:
    def test_long_chain_converges(self, ray_session):
        import ray.data

        from lucene_ray.pipelines.dedup import propagate_min_labels

        # path graph 0-1-2-...-n: eccentricity n-1 from the min node;
        # one-hop propagation needs ~n rounds, pointer jumping O(log n)
        n = 200
        pairs = ray.data.from_items(
            [{"a": i, "b": i + 1} for i in range(n - 1)]
        )
        labels = propagate_min_labels(pairs, max_rounds=12).to_pandas()
        assert len(labels) == n
        assert (labels["l"] == 0).all()

    def test_two_components(self, ray_session):
        import ray.data

        from lucene_ray.pipelines.dedup import propagate_min_labels

        pairs = ray.data.from_items(
            [{"a": i, "b": i + 1} for i in range(0, 49)]
            + [{"a": i, "b": i + 1} for i in range(100, 149)]
        )
        lab = propagate_min_labels(pairs, max_rounds=10).to_pandas()
        lab = dict(zip(lab["u"], lab["l"]))
        assert all(lab[i] == 0 for i in range(50))
        assert all(lab[i] == 100 for i in range(100, 150))


class TestStringIndexSortEarlyTermination:
    @pytest.fixture(scope="class")
    def indexes(self, ray_session, tmp_path_factory):
        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig
        from lucene_ray.search.searcher import IndexSearcher

        base = tmp_path_factory.mktemp("stridx")
        plain_d = str(base / "plain")
        sorted_d = str(base / "sorted")
        cfg = IndexConfig(rows_per_segment=300, dv_cols=("lang",))
        build_index(DOCS, plain_d, cfg)
        build_index(
            DOCS,
            sorted_d,
            IndexConfig(
                rows_per_segment=300,
                dv_cols=("lang",),
                index_sort=("lang", "asc"),
            ),
        )
        return IndexSearcher(plain_d), IndexSearcher(sorted_d)

    # keys can differ between the two indexes on ties (different docid
    # order), but the ordered top-k VALUE sequence and total are unique

    def test_descending_no_typeerror_and_matches(self, indexes):
        plain, srt = indexes
        a = plain.search_sorted("data", "lang", k=10, descending=True)
        b = srt.search_sorted("data", "lang", k=10, descending=True)
        assert b["sort_values"] == sorted(b["sort_values"], reverse=True)
        assert a["sort_values"] == b["sort_values"]
        assert a["total_hits"] == b["total_hits"]

    def test_ascending_matches_plain(self, indexes):
        plain, srt = indexes
        a = plain.search_sorted("data", "lang", k=10, descending=False)
        b = srt.search_sorted("data", "lang", k=10, descending=False)
        assert b["sort_values"] == sorted(b["sort_values"])
        assert a["sort_values"] == b["sort_values"]
        assert a["total_hits"] == b["total_hits"]
