"""LSH-bucketed approximate nearest neighbor — the scale path for
similarity search (brute force lives in ``pipelines.knn``).

Random-hyperplane LSH (SimHash for vectors): ``n_bits`` signed
projections bucket each vector; candidates = vectors sharing a bucket
with the query under any of ``n_tables`` independent hash tables; exact
cosine re-rank on candidates only. At cluster scale the bucket build is a
``groupby(bucket)`` over the embedding table and queries probe only their
buckets — the all-to-all matmul disappears.

The plan here: one ``map_batches`` pass computes signatures and emits
``(table, bucket, vec_id)`` rows; candidates come from a hash join of the
query buckets (broadcast — tiny) against those rows; the exact re-rank
reads only candidate vectors.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa

N_TABLES = 8
N_BITS = 12


def _planes(dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N_TABLES, N_BITS, dim))


def _signatures(emb: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """→ int32[n, N_TABLES] bucket ids from sign patterns."""
    n = emb.shape[0]
    out = np.empty((n, N_TABLES), dtype=np.int64)
    pows = 1 << np.arange(N_BITS, dtype=np.int64)
    for t in range(N_TABLES):
        bits = (emb @ planes[t].T) > 0
        out[:, t] = bits @ pows
    return out


def lsh_knn(sf_dir: str, query_vec_ids: List[int] = (0, 1, 2), k: int = 5):
    """→ (qid, rank, vec_id, sim_bp): ANN top-k via hyperplane LSH with
    exact cosine re-rank of candidates; recall < 1 by construction — the
    driver records a rows-only check (non-SQL-expressible plan)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    arr = tbl.column("embedding").combine_chunks()
    full = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
    ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
    dim = full.shape[1]
    planes = _planes(dim)

    idx_of = {int(v): i for i, v in enumerate(ids)}
    q_rows = np.array([idx_of[q] for q in query_vec_ids])
    q_emb = full[q_rows]
    q_sig = _signatures(q_emb, planes)  # (nq, T)
    planes_ref = ray.put(planes)
    qsig_ref = ray.put(q_sig)

    def stage(b: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        qs = ray.get(qsig_ref)
        a = b.column("embedding").combine_chunks()
        emb = np.asarray(a.values, dtype=np.float64).reshape(len(a), -1)
        sig = _signatures(emb, pl)
        vids = np.asarray(b.column("vec_id"), dtype=np.int64)
        # candidate if any table bucket matches any query's bucket
        out_q, out_v = [], []
        for qi in range(qs.shape[0]):
            match = (sig == qs[qi][None, :]).any(axis=1)
            for v in vids[match]:
                out_q.append(qi)
                out_v.append(int(v))
        return pa.table(
            {"qi": pa.array(out_q, pa.int32()), "vec_id": pa.array(out_v, pa.int64())}
        )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    cand = ds.map_batches(stage, batch_format="pyarrow", batch_size=4096).to_pandas()

    qn = q_emb / np.linalg.norm(q_emb, axis=1, keepdims=True)
    nrm = np.linalg.norm(full, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    full_n = full / nrm
    rows = []
    for qi, qvid in enumerate(query_vec_ids):
        cvs = sorted(set(cand[cand.qi == qi]["vec_id"]))
        if not cvs:
            continue
        rows_idx = np.array([idx_of[c] for c in cvs])
        sims = full_n[rows_idx] @ qn[qi]
        bp = np.floor(sims * 10000).astype(np.int64)
        order = np.lexsort((np.array(cvs), -bp))[:k]
        for rank, oi in enumerate(order):
            rows.append((int(qvid), rank, int(cvs[oi]), int(bp[oi])))
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "vec_id": pa.array([r[2] for r in rows], pa.int64()),
            "sim_bp": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
