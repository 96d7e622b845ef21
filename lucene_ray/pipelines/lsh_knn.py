"""LSH-bucketed approximate nearest neighbor — the scale path for
similarity search (brute force lives in ``pipelines.knn``).

Random-hyperplane LSH (SimHash for vectors): ``n_bits`` signed
projections bucket each vector; candidates = vectors sharing a bucket
with the query under any of ``n_tables`` independent hash tables; exact
cosine re-rank on candidates only.

Plan (fully distributed — nothing reads the embedding table on the
driver):

  - the ``nq`` query vectors load via parquet predicate pushdown (footer
    + matching row groups only); their bucket signatures and normalized
    rows broadcast once (``ray.put``) — the classic tiny-side broadcast;
  - ONE ``map_batches`` pass signatures each batch, masks rows whose
    bucket matches any query bucket in any table, and exact-cosine
    re-ranks the survivors against the broadcast query matrix, emitting a
    per-batch partial top-k (the same partial-reduce shape as
    ``knn.knn_cosine``);
  - a ``groupby(qid)`` over the tiny partials produces the global top-k.

At 10^12 rows the candidate mask prunes each batch to the bucket hit
rate (~``nq * n_tables / 2^n_bits`` of rows); no shuffle of the
embedding table ever happens.
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
    """→ int64[n, N_TABLES] bucket ids from sign patterns."""
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
    q_tbl = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(query_vec_ids))],
    )
    arr = q_tbl.column("embedding").combine_chunks()
    q_raw = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
    q_ids = np.asarray(q_tbl.column("vec_id"), dtype=np.int64)
    order = {int(v): i for i, v in enumerate(q_ids)}
    q_emb = q_raw[[order[q] for q in query_vec_ids]]
    dim = q_emb.shape[1]
    planes = _planes(dim)
    q_sig = _signatures(q_emb, planes)  # (nq, T) — signatures are
    # norm-invariant (sign of projection), so raw vectors are fine here
    qn = q_emb / np.linalg.norm(q_emb, axis=1, keepdims=True)
    bcast = ray.put((planes, q_sig, qn))

    def stage(b: pa.Table) -> pa.Table:
        pl, qs, qm = ray.get(bcast)
        a = b.column("embedding").combine_chunks()
        emb = np.asarray(a.values, dtype=np.float64).reshape(len(a), -1)
        sig = _signatures(emb, pl)
        vids = np.asarray(b.column("vec_id"), dtype=np.int64)
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        emb_n = emb / nrm
        out_q, out_v, out_s = [], [], []
        for qi in range(qs.shape[0]):
            match = (sig == qs[qi][None, :]).any(axis=1)
            cand = np.flatnonzero(match)
            if len(cand) == 0:
                continue
            sims = emb_n[cand] @ qm[qi]
            bp = np.floor(sims * 10000 + 0.5).astype(np.int64)  # same
            # half-away bp rule as knn_cosine (self-sim sits on the
            # integer boundary where plain floor flips on ±1ulp)
            top = np.lexsort((vids[cand], -bp))[:k]  # partial top-k by the
            # final ordering — can never drop a global winner
            out_q.extend([int(query_vec_ids[qi])] * len(top))
            out_v.extend(vids[cand][top])
            out_s.extend(bp[top])
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim_bp": pa.array(out_s, pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        bp = np.asarray(group.column("sim_bp"), dtype=np.int64)
        vid = np.asarray(group.column("vec_id"), dtype=np.int64)
        sel = np.lexsort((vid, -bp))[:k]
        return pa.table(
            {
                "qid": group.column("qid").take(sel),
                "rank": pa.array(np.arange(len(sel), dtype=np.int32)),
                "vec_id": pa.array(vid[sel], pa.int64()),
                "sim_bp": pa.array(bp[sel], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(stage, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("qid").map_groups(topk, batch_format="pyarrow")
