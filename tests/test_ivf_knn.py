"""IVF ANN: partitioned inverted-file build, partition-pruned probes,
exhaustive-probe equivalence to brute force, recall behavior."""

import os

import numpy as np
import pytest

from lucene_ray.pipelines.ivf_knn import (
    N_LISTS,
    _normalize,
    build_ivf,
    ivf_knn,
    train_centroids,
)
from lucene_ray.pipelines.knn import knn_cosine

SF = "/root/testdata/sf0.001"


class TestTrain:
    def test_deterministic(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 16))
        a = train_centroids(x, 8)
        b = train_centroids(x, 8)
        assert np.array_equal(a, b)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_clusters_separate_structure(self):
        rng = np.random.default_rng(1)
        # two well-separated blobs → centroids split them
        a = rng.normal(size=(200, 8)) * 0.05 + np.eye(8)[0]
        b = rng.normal(size=(200, 8)) * 0.05 + np.eye(8)[1]
        x = np.vstack([a, b])
        cents = train_centroids(x, 2)
        assign = np.argmax(_normalize(x) @ cents.T, axis=1)
        assert len(set(assign[:200])) == 1
        assert len(set(assign[200:])) == 1
        assert assign[0] != assign[200]


class TestIvf:
    def test_build_is_partitioned_and_cached(self, ray_session):
        d1 = build_ivf(SF)
        d2 = build_ivf(SF)
        assert d1 == d2
        parts = [
            p for p in os.listdir(os.path.join(d1, "data")) if p.startswith("list=")
        ]
        assert 1 < len(parts) <= N_LISTS
        assert os.path.exists(os.path.join(d1, "centroids.npy"))

    def test_full_probe_equals_brute_force(self, ray_session):
        exact = knn_cosine(SF).to_pandas()
        ivf = ivf_knn(SF, nprobe=N_LISTS).to_pandas()
        assert exact.equals(ivf)

    def test_recall_monotone_and_reasonable(self, ray_session):
        exact = knn_cosine(SF).to_pandas()
        truth = {
            qid: set(g.vec_id) for qid, g in exact.groupby("qid")
        }

        def recall(nprobe):
            got = ivf_knn(SF, nprobe=nprobe).to_pandas()
            hits = sum(
                len(set(g.vec_id) & truth[qid])
                for qid, g in got.groupby("qid")
            )
            total = sum(len(v) for v in truth.values())
            return hits / total

        r1 = recall(1)
        r4 = recall(4)
        r8 = recall(N_LISTS)
        assert r1 <= r4 + 1e-9 <= r8 + 2e-9
        assert r8 == 1.0
        assert r1 > 0  # the probed nearest list finds at least something
