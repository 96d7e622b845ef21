"""Pre-filtered vector search (KnnFloatVectorQuery filter role)."""

import numpy as np
import pyarrow.parquet as pq

from lucene_ray.pipelines.knn import KNN_K, QUERY_VEC_IDS, knn_filtered

SF = "/root/testdata/sf0.001"


def brute(lang="en"):
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    ok = {
        int(d)
        for d, l in zip(
            docs.column("doc_id").to_pylist(), docs.column("lang").to_pylist()
        )
        if l == lang
    }
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(emb.column("vec_id"), dtype=np.int64)
    arr = emb.column("embedding").combine_chunks()
    m = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    mn = m / n
    out = {}
    for q in QUERY_VEC_IDS:
        qv = mn[int(np.flatnonzero(ids == q)[0])]
        keep = np.array([i in ok for i in ids])
        bp = np.floor(mn[keep] @ qv * 10000 + 0.5).astype(np.int64)
        kid = ids[keep]
        sel = np.lexsort((kid, -bp))[:KNN_K]
        out[q] = [(int(kid[i]), int(bp[i])) for i in sel]
    return out, ok


def test_matches_bruteforce_and_respects_filter(ray_session):
    t = knn_filtered(SF).to_pandas()
    want, ok = brute()
    for q in QUERY_VEC_IDS:
        sub = t[t.qid == q].sort_values("rank")
        got = list(zip(sub.vec_id.astype(int), sub.sim_bp.astype(int)))
        assert got == want[q]
        assert all(v in ok for v, _ in got)
