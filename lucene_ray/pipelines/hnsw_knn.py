"""HNSW graph ANN over the ``embeddings`` table — the reference's
graph-based vector index (`lucene/core/src/java/org/apache/lucene/util/
hnsw/HnswGraphBuilder.java`, `HnswGraphSearcher.java`,
`core/search/KnnFloatVectorQuery.java`) re-expressed Ray-Data-first.

Clean-room implementation of the published HNSW algorithm (Malkov &
Yashunin, "Efficient and robust approximate nearest neighbor search
using Hierarchical Navigable Small World graphs", 2016):

- **Sharded like Lucene segments.** Lucene builds ONE graph per segment
  and merges per-segment top-k (`KnnFloatVectorQuery` rewrites to the
  union of per-leaf results). Here each Ray block of the embeddings
  table becomes one shard: a `map_batches` task builds that shard's
  graph independently (embarrassingly parallel — no cross-shard
  coordination), persists it as an `.npz`, and emits one meta row. At
  100 TB each shard is bounded by the block size, so build memory is
  O(shard), never O(corpus).
- **Deterministic.** Level assignment hashes the vector id
  (splitmix64 → uniform → floor(-ln(u)·mL)) instead of an RNG, so
  rebuilds are bit-identical; insertion order is row order within the
  shard; all candidate heaps tie-break on vector index.
- **Query**: one task per shard loads its graph (memory-mapped arrays),
  runs best-first search with `ef` candidates for every query in the
  broadcast query matrix, returns per-shard top-k; the driver merges
  the tiny per-shard results (same final ordering rules as
  ``knn_cosine``: sim basis points desc, vec_id asc).

Approximate by construction, so the driver gate records a rows-only
check; recall versus brute force and build determinism are pinned in
``tests/test_hnsw_knn.py``.
"""

from __future__ import annotations

import hashlib
import heapq
import math
import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from lucene_ray.pipelines.knn import KNN_K, QUERY_VEC_IDS, _emb_path, _load_queries

M = 8  # max neighbors per node on upper levels; level 0 allows 2M
EF_CONSTRUCTION = 64
EF_SEARCH = 48
SHARD_ROWS = 1024  # vectors per shard at bench sf; a knob, not a limit
CACHE_ROOT = os.environ.get("LUCENE_RAY_CACHE", "/tmp/lucene_ray_idx")

_ML = 1.0 / math.log(M)


class _VisitBudgetExceeded(Exception):
    """HNSW traversal scored more nodes than the filter's cardinality —
    signal the caller to fall back to exact search over the accepted set
    (``KnnFloatVectorQuery.java`` visitedLimit semantics)."""


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(-1)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(-1)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(-1)
    return z ^ (z >> np.uint64(31))


def _levels_for(vec_ids: np.ndarray) -> np.ndarray:
    """Hash-derived HNSW level per node: floor(-ln(u) * mL)."""
    h = _splitmix64(vec_ids.astype(np.uint64))
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = np.clip(u, 1e-12, 1.0 - 1e-12)
    return np.floor(-np.log(u) * _ML).astype(np.int32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _ShardGraph:
    """In-memory HNSW graph for one shard (build + search).

    Neighbor storage: per level, an int32 matrix [n, cap] padded with
    -1 (cap = 2M at level 0, M above), plus a per-node neighbor count.
    Similarity = dot over normalized vectors (cosine), maximized.
    """

    def __init__(self, vectors: np.ndarray, vec_ids: np.ndarray):
        # quantize through float32 (the persisted dtype, like Lucene's
        # float vectors) so a saved+loaded graph scores identically
        self.v = _normalize(vectors.astype(np.float64)).astype(np.float32).astype(np.float64)
        self.ids = vec_ids.astype(np.int64)
        self.levels = _levels_for(self.ids)
        self.max_level = -1
        self.entry = -1
        n = len(self.v)
        self.nbrs: List[np.ndarray] = []  # per level [n, cap] int32
        self.cnt: List[np.ndarray] = []  # per level [n] int32
        for i in range(n):
            self._insert(i)

    # -- storage helpers ---------------------------------------------------
    def _ensure_level(self, lvl: int) -> None:
        n = len(self.v)
        while len(self.nbrs) <= lvl:
            cap = 2 * M if len(self.nbrs) == 0 else M
            self.nbrs.append(np.full((n, cap), -1, np.int32))
            self.cnt.append(np.zeros(n, np.int32))

    def _neigh(self, node: int, lvl: int) -> np.ndarray:
        return self.nbrs[lvl][node, : self.cnt[lvl][node]]

    # -- core ---------------------------------------------------------------
    def _greedy(self, q: np.ndarray, start: int, lvl: int) -> int:
        """ef=1 descent on one level: move to the best neighbor until a
        local maximum of similarity."""
        cur = start
        cur_sim = float(self.v[cur] @ q)
        improved = True
        while improved:
            improved = False
            nb = self._neigh(cur, lvl)
            if len(nb):
                sims = self.v[nb] @ q
                j = int(np.argmax(sims))
                if sims[j] > cur_sim or (
                    sims[j] == cur_sim and int(nb[j]) < cur
                ):
                    cur, cur_sim = int(nb[j]), float(sims[j])
                    improved = True
        return cur

    def _search_level(
        self,
        q: np.ndarray,
        eps: List[int],
        ef: int,
        lvl: int,
        accept: np.ndarray = None,
        visit_limit: int = None,
    ) -> List[Tuple[float, int]]:
        """Best-first search with ef results on one level →
        [(sim, node)] unsorted. Deterministic tie-breaks via node index.

        ``accept``: optional bool mask over row indices — rejected nodes
        are still TRAVERSED (they keep the graph connected, exactly like
        Lucene's acceptOrds bitset in ``HnswGraphSearcher.java``: the
        filter gates result collection, not expansion). ``visit_limit``:
        abort by raising ``_VisitBudgetExceeded`` once that many nodes
        have been scored — ``KnnFloatVectorQuery.java`` sets this to the
        filter's cardinality and falls back to exact search on excess.
        """
        visited = set(eps)
        n_visited = len(visited)
        # heaps keyed on (-sim, node) / (sim, node): node index breaks ties
        cand: List[Tuple[float, int]] = []
        res: List[Tuple[float, int]] = []
        for e in eps:
            s = float(self.v[e] @ q)
            heapq.heappush(cand, (-s, e))
            if accept is None or accept[e]:
                heapq.heappush(res, (s, e))
        while cand:
            negs, c = heapq.heappop(cand)
            if len(res) >= ef and -negs < res[0][0]:
                break
            nb = self._neigh(c, lvl)
            fresh = [int(x) for x in nb if int(x) not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            n_visited += len(fresh)
            if visit_limit is not None and n_visited > visit_limit:
                raise _VisitBudgetExceeded()
            sims = self.v[fresh] @ q
            for x, s in zip(fresh, sims):
                s = float(s)
                worst = res[0][0] if res else -math.inf
                if len(res) < ef or s > worst:
                    heapq.heappush(cand, (-s, x))
                    if accept is None or accept[x]:
                        heapq.heappush(res, (s, x))
                        if len(res) > ef:
                            heapq.heappop(res)
        return res

    def _select(
        self, cands: List[Tuple[float, int]], m: int
    ) -> List[int]:
        """Neighbor-selection heuristic (paper Algorithm 4): keep a
        candidate only if it is closer to the base than to every
        already-selected neighbor — spreads links across clusters."""
        out: List[int] = []
        for sim, node in sorted(cands, key=lambda t: (-t[0], t[1])):
            if len(out) >= m:
                break
            ok = True
            for o in out:
                if float(self.v[node] @ self.v[o]) > sim:
                    ok = False
                    break
            if ok:
                out.append(node)
        if len(out) < m:  # backfill with closest rejected ones
            chosen = set(out)
            for sim, node in sorted(cands, key=lambda t: (-t[0], t[1])):
                if len(out) >= m:
                    break
                if node not in chosen:
                    out.append(node)
        return out

    def _link(self, a: int, b: int, lvl: int) -> None:
        """Add edge a→b, pruning a's list with the heuristic if full."""
        cap = self.nbrs[lvl].shape[1]
        c = int(self.cnt[lvl][a])
        if c < cap:
            self.nbrs[lvl][a, c] = b
            self.cnt[lvl][a] = c + 1
            return
        cur = [int(x) for x in self.nbrs[lvl][a]]
        cands = [(float(self.v[x] @ self.v[a]), x) for x in cur + [b]]
        keep = self._select(cands, cap)
        self.nbrs[lvl][a, : len(keep)] = keep
        self.nbrs[lvl][a, len(keep) :] = -1
        self.cnt[lvl][a] = len(keep)

    def _insert(self, i: int) -> None:
        lvl = int(self.levels[i])
        if self.entry < 0:
            self._ensure_level(lvl)
            self.entry, self.max_level = i, lvl
            return
        self._ensure_level(lvl)
        q = self.v[i]
        cur = self.entry
        for l in range(self.max_level, lvl, -1):
            cur = self._greedy(q, cur, l)
        eps = [cur]
        for l in range(min(lvl, self.max_level), -1, -1):
            res = self._search_level(q, eps, EF_CONSTRUCTION, l)
            m = 2 * M if l == 0 else M
            sel = self._select(res, m)
            for nb in sel:
                self._link(i, nb, l)
                self._link(nb, i, l)
            eps = [n for _, n in sorted(res, key=lambda t: (-t[0], t[1]))]
        if lvl > self.max_level:
            self.max_level, self.entry = lvl, i

    # -- public -------------------------------------------------------------
    def search(self, q: np.ndarray, k: int, ef: int) -> List[Tuple[float, int]]:
        """→ [(sim, row_index)] top-k, sim desc then row asc."""
        if self.entry < 0:
            return []
        cur = self.entry
        for l in range(self.max_level, 0, -1):
            cur = self._greedy(q, cur, l)
        res = self._search_level(q, [cur], max(ef, k), 0)
        res.sort(key=lambda t: (-t[0], t[1]))
        return res[:k]

    def search_filtered(
        self, q: np.ndarray, k: int, ef: int, accept: np.ndarray
    ) -> List[Tuple[float, int]]:
        """Filtered top-k: graph traversal collects only ``accept``-ed
        rows, with visit budget = |accept| (the filter's cost, as in
        ``KnnFloatVectorQuery.java``) — if the traversal would score more
        nodes than a linear scan of the filtered set, do the exact scan
        instead (identical result discipline, guaranteed full recall)."""
        n_ok = int(accept.sum())
        if n_ok == 0:
            return []
        budget = max(n_ok, ef)
        try:
            if self.entry < 0:
                raise _VisitBudgetExceeded()
            cur = self.entry
            for l in range(self.max_level, 0, -1):
                cur = self._greedy(q, cur, l)
            res = self._search_level(
                q, [cur], max(ef, k), 0, accept=accept, visit_limit=budget
            )
        except _VisitBudgetExceeded:
            rows = np.nonzero(accept)[0]
            sims = self.v[rows] @ q
            res = [(float(s), int(r)) for s, r in zip(sims, rows)]
        res.sort(key=lambda t: (-t[0], t[1]))
        return res[:k]

    def save(self, path: str) -> None:
        arrs: Dict[str, np.ndarray] = {
            "v": self.v.astype(np.float32),
            "ids": self.ids,
            "meta": np.array([self.entry, self.max_level], np.int64),
        }
        for l, (nb, c) in enumerate(zip(self.nbrs, self.cnt)):
            arrs[f"nbrs{l}"] = nb
            arrs[f"cnt{l}"] = c
        tmp = path + ".tmp"
        np.savez(tmp, **arrs)
        os.replace(tmp + ".npz", path)

    @classmethod
    def load(cls, path: str) -> "_ShardGraph":
        z = np.load(path)
        g = cls.__new__(cls)
        g.v = z["v"].astype(np.float64)
        g.ids = z["ids"]
        g.entry, g.max_level = (int(x) for x in z["meta"])
        g.nbrs, g.cnt = [], []
        l = 0
        while f"nbrs{l}" in z:
            g.nbrs.append(z[f"nbrs{l}"])
            g.cnt.append(z[f"cnt{l}"])
            l += 1
        return g


def build_hnsw(sf_dir: str) -> str:
    """Build (or reuse) the sharded HNSW index; returns its dir.

    One `map_batches` task per shard builds that shard's graph and
    writes `shard_<first_vec_id>.npz`; `_DONE` commits the set
    (two-phase, like the segment builds)."""
    import ray
    import ray.data

    emb = _emb_path(sf_dir)
    tag = hashlib.sha1(
        f"hnsw:{os.path.abspath(emb)}:{os.path.getmtime(emb)}:{M}:"
        f"{EF_CONSTRUCTION}:{SHARD_ROWS}".encode()
    ).hexdigest()[:16]
    idx_dir = os.path.join(CACHE_ROOT, f"hnsw_{tag}")
    marker = os.path.join(idx_dir, "_DONE")
    if os.path.exists(marker):
        return idx_dir
    os.makedirs(idx_dir, exist_ok=True)

    def build_shard(b: pa.Table) -> pa.Table:
        arr = b.column("embedding").combine_chunks()
        m = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
        ids = np.asarray(b.column("vec_id"), dtype=np.int64)
        g = _ShardGraph(m, ids)
        name = f"shard_{int(ids.min()):012d}.npz"
        g.save(os.path.join(idx_dir, name))
        return pa.table(
            {"shard": pa.array([name]), "rows": pa.array([len(ids)], pa.int64())}
        )

    ds = ray.data.read_parquet(emb, columns=["vec_id", "embedding"])
    metas = ds.map_batches(
        build_shard, batch_format="pyarrow", batch_size=SHARD_ROWS
    ).take_all()  # tiny: one meta row per shard
    with open(os.path.join(idx_dir, "shards.txt"), "w") as f:
        for r in sorted(m["shard"] for m in metas):
            f.write(r + "\n")
    with open(marker, "w"):
        pass
    return idx_dir


def hnsw_knn(sf_dir: str, ef: int = EF_SEARCH):
    """→ (qid, rank, vec_id, sim_bp) like ``knn_cosine`` — per-shard
    graph search fanned out as one task per shard, tiny driver merge."""
    import ray
    import ray.data

    idx_dir = build_hnsw(sf_dir)
    with open(os.path.join(idx_dir, "shards.txt")) as f:
        shards = [ln.strip() for ln in f if ln.strip()]
    q = _load_queries(sf_dir)
    qn = _normalize(q.astype(np.float64))
    q_ref = ray.put(qn)

    def search_shard(b: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[int] = []
        for name in b.column("shard").to_pylist():
            g = _ShardGraph.load(os.path.join(idx_dir, name))
            for qi in range(qm.shape[0]):
                for sim, row in g.search(qm[qi], KNN_K, ef):
                    out_q.append(qi)
                    out_v.append(int(g.ids[row]))
                    out_s.append(int(math.floor(sim * 10000 + 0.5)))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim_bp": pa.array(out_s, pa.int64()),
            }
        )

    sds = ray.data.from_items([{"shard": s} for s in shards])
    cand = sds.map_batches(
        search_shard, batch_format="pyarrow", batch_size=1
    ).to_pandas()  # ≤ n_shards * n_queries * k rows — tiny
    rows = []
    for qi in range(len(QUERY_VEC_IDS)):
        sub = cand[cand.qi == qi].sort_values(
            ["sim_bp", "vec_id"], ascending=[False, True]
        ).head(KNN_K)
        for rank, (_, r) in enumerate(sub.iterrows()):
            rows.append((QUERY_VEC_IDS[qi], rank, int(r.vec_id), int(r.sim_bp)))
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "vec_id": pa.array([r[2] for r in rows], pa.int64()),
            "sim_bp": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def knn_hnsw(sf_dir: str):
    """Driver-gate entry (rows-only: HNSW is approximate by design;
    recall vs brute force is pinned in tests/test_hnsw_knn.py)."""
    return hnsw_knn(sf_dir)


def hnsw_knn_filtered(sf_dir: str, lang: str = "en", ef: int = EF_SEARCH):
    """Filtered HNSW — ``KnnFloatVectorQuery``'s filter evaluated DURING
    graph traversal (`core/search/KnnFloatVectorQuery.java`: acceptOrds
    bitset + visitedLimit fallback to exact), vs ``knn_filtered``'s
    brute-prefilter plan. Ray shape: the filter side reads only doc_id
    with the lang predicate pushed into the parquet scan, the sorted id
    set rides one ``ray.put`` broadcast with the query matrix, and each
    shard task masks its own rows locally — per-shard accept bitsets,
    like Lucene's per-leaf bitsets."""
    import pyarrow.parquet as pq_

    import ray
    import ray.data

    idx_dir = build_hnsw(sf_dir)
    with open(os.path.join(idx_dir, "shards.txt")) as f:
        shards = [ln.strip() for ln in f if ln.strip()]
    q = _load_queries(sf_dir)
    qn = _normalize(q.astype(np.float64))
    ids = pq_.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"],
        filters=[("lang", "=", lang)],
    ).column("doc_id")
    allowed = np.sort(np.asarray(ids, dtype=np.int64))
    bcast = ray.put((qn, allowed))

    def search_shard(b: pa.Table) -> pa.Table:
        qm, ok_ids = ray.get(bcast)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[int] = []
        for name in b.column("shard").to_pylist():
            g = _ShardGraph.load(os.path.join(idx_dir, name))
            pos = np.searchsorted(ok_ids, g.ids)
            safe = np.minimum(pos, max(len(ok_ids) - 1, 0))
            accept = (
                np.zeros(len(g.ids), dtype=bool)
                if len(ok_ids) == 0
                else ok_ids[safe] == g.ids
            )
            if not accept.any():
                continue
            for qi in range(qm.shape[0]):
                for sim, row in g.search_filtered(qm[qi], KNN_K, ef, accept):
                    out_q.append(qi)
                    out_v.append(int(g.ids[row]))
                    out_s.append(int(math.floor(sim * 10000 + 0.5)))
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim_bp": pa.array(out_s, pa.int64()),
            }
        )

    sds = ray.data.from_items([{"shard": s} for s in shards])
    cand = sds.map_batches(
        search_shard, batch_format="pyarrow", batch_size=1
    ).to_pandas()  # ≤ n_shards * n_queries * k rows — tiny
    rows = []
    for qi in range(len(QUERY_VEC_IDS)):
        sub = cand[cand.qi == qi].sort_values(
            ["sim_bp", "vec_id"], ascending=[False, True]
        ).head(KNN_K)
        for rank, (_, r) in enumerate(sub.iterrows()):
            rows.append((QUERY_VEC_IDS[qi], rank, int(r.vec_id), int(r.sim_bp)))
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "vec_id": pa.array([r[2] for r in rows], pa.int64()),
            "sim_bp": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def knn_hnsw_filtered(sf_dir: str):
    """Driver-gate entry (rows-only; recall + exact-fallback equivalence
    pinned in tests/test_hnsw_knn.py)."""
    return hnsw_knn_filtered(sf_dir)
