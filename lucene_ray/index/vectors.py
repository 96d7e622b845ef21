"""Per-segment vector graph core — the role of Lucene's
``Lucene99HnswVectorsFormat`` + ``HnswGraphBuilder`` / ``HnswGraphSearcher``
(``core/codecs/lucene99/Lucene99HnswVectorsFormat.java``,
``core/util/hnsw/HnswGraphBuilder.java``): float32 vectors plus a
deterministic HNSW graph, stored per segment (``vectors.hnsw.npz``
beside postings) or per embedding shard (``pipelines/hnsw_knn.py``).

Clean-room implementation of the published HNSW algorithm (Malkov &
Yashunin 2016); level assignment hashes the vector id (splitmix64) so
rebuilds are bit-identical. The filtered search follows
``KnnFloatVectorQuery.java``: an accept bitset gates result collection
(rejected nodes still traverse, keeping the graph connected) under a
visit budget equal to the filter's cardinality, falling back to an
exact scan over the accepted rows when exceeded.
"""

from __future__ import annotations

import heapq
import io
import math
import os
from typing import Dict, List, Tuple

import numpy as np

VECTORS_FILE = "vectors.hnsw.npz"

M = 8  # max neighbors per node on upper levels; level 0 allows 2M
EF_CONSTRUCTION = 64
EF_SEARCH = 48

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
        # raw (un-normalized) float32 vectors — the exact-fallback path
        # (``KnnFloatVectorQuery.java`` visitedLimit → exact scan) scores
        # from these with the identical float64 expression brute-force
        # ``knn_cosine`` uses, so gate-exact results hash-match its oracle
        self.raw = vectors.astype(np.float32)
        # int8 scalar-quantized codes (the
        # ``Lucene99ScalarQuantizedVectorsFormat`` role: Lucene stores
        # int8 codes in .veq AND keeps raw floats in .vec for re-rank/
        # merge). Quantized from the SAME float64-normalized form the
        # exact scan scores, so the error-bounded prune+re-rank in
        # ``exact_topk_quantized`` is provably brute-force-identical.
        self.codes = np.clip(
            np.rint(_normalize(vectors.astype(np.float64)) * 127),
            -127,
            127,
        ).astype(np.int8)
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

    def exact_topk(
        self,
        qm: np.ndarray,
        k: int,
        accept: np.ndarray = None,
        tie: np.ndarray = None,
    ) -> List[List[Tuple[int, int]]]:
        """Exact per-shard top-k — the ``KnnFloatVectorQuery.java``
        visitedLimit-exceeded fallback, scored bit-identically to
        brute-force ``knn_cosine``: float64 normalize of the RAW float32
        vectors, one GEMM against the normalized query matrix, then
        ``floor(sim*1e4 + 0.5)`` basis points. → per query row of ``qm``,
        a list of (bp, row_index) cut and ordered by (bp desc, tie asc)
        — the FINAL ordering, so the cut can never drop a global winner.

        ``tie``: per-row tie-break values (global ids); defaults to
        ``self.ids``. ``accept``: optional bool row mask.
        """
        emb = (self.raw if self.raw is not None else self.v).astype(
            np.float64
        )
        ties = self.ids if tie is None else np.asarray(tie, dtype=np.int64)
        rows = np.arange(len(emb))
        if accept is not None:
            rows = rows[accept]
            if len(rows) == 0:
                return [[] for _ in range(qm.shape[0])]
            emb = emb[rows]
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ qm.T  # (n_rows, n_queries)
        out: List[List[Tuple[int, int]]] = []
        for qi in range(qm.shape[0]):
            bp = np.floor(sims[:, qi] * 10000 + 0.5).astype(np.int64)
            order = np.lexsort((ties[rows], -bp))[: min(k, len(rows))]
            out.append([(int(bp[j]), int(rows[j])) for j in order])
        return out

    def exact_topk_quantized(
        self,
        qm: np.ndarray,
        k: int,
        accept: np.ndarray = None,
        tie: np.ndarray = None,
    ) -> List[List[Tuple[int, int]]]:
        """Same contract and PROVABLY same output as :meth:`exact_topk`,
        but the full scan runs on int8 codes (one int32 GEMM — the
        ``Lucene99ScalarQuantizedVectorsFormat`` scoring path); exact
        float64 math touches only the error-bound survivors
        (``quantized_knn.py`` bound: |x.y − x̂.ŷ| ≤ δ(Σ|x|+Σ|ŷ|),
        δ=1/254, so pruning below θ−1e-4 can never drop a true top-k
        member or flip a same-bucket tie). Falls back to the float scan
        on pre-codes graphs."""
        if self.codes is None:
            return self.exact_topk(qm, k, accept=accept, tie=tie)
        ties = self.ids if tie is None else np.asarray(tie, dtype=np.int64)
        rows = np.arange(len(self.codes))
        if accept is not None:
            rows = rows[accept]
            if len(rows) == 0:
                return [[] for _ in range(qm.shape[0])]
        codes = self.codes[rows]
        # exact side: float64 normalize of the raw float32 vectors —
        # the identical expression exact_topk / brute-force knn use
        raw = (self.raw if self.raw is not None else self.v).astype(
            np.float64
        )[rows]
        norms = np.linalg.norm(raw, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = raw / norms
        q_codes = np.clip(np.rint(qm * 127), -127, 127).astype(np.int8)
        approx = (codes.astype(np.int32) @ q_codes.T.astype(np.int32)) / (
            127.0 * 127.0
        )
        delta = 1.0 / 254.0
        doc_l1 = np.abs(x).sum(axis=1)
        q_l1_hat = np.abs(q_codes.astype(np.float64) / 127.0).sum(axis=1)
        out: List[List[Tuple[int, int]]] = []
        for qi in range(qm.shape[0]):
            a = approx[:, qi]
            eps = delta * (doc_l1 + q_l1_hat[qi]) + 1e-9
            kk = min(k, len(a))
            lower = a - eps
            theta = np.partition(lower, len(lower) - kk)[len(lower) - kk]
            keep = np.flatnonzero(a + eps >= theta - 1e-4)
            sims = x[keep] @ qm[qi]
            bp = np.floor(sims * 10000 + 0.5).astype(np.int64)
            sub_rows = rows[keep]
            order = np.lexsort((ties[sub_rows], -bp))[:kk]
            out.append([(int(bp[j]), int(sub_rows[j])) for j in order])
        return out

    def save(self, path: str) -> None:
        arrs: Dict[str, np.ndarray] = {
            "v": self.v.astype(np.float32),
            "ids": self.ids,
            "meta": np.array([self.entry, self.max_level], np.int64),
        }
        if self.raw is not None:
            arrs["raw"] = self.raw
        if self.codes is not None:
            arrs["codes"] = self.codes
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
        g.raw = z["raw"] if "raw" in z else None  # pre-raw-format graphs
        g.codes = z["codes"] if "codes" in z else None  # pre-int8 graphs
        g.ids = z["ids"]
        g.entry, g.max_level = (int(x) for x in z["meta"])
        g.nbrs, g.cnt = [], []
        l = 0
        while f"nbrs{l}" in z:
            g.nbrs.append(z[f"nbrs{l}"])
            g.cnt.append(z[f"cnt{l}"])
            l += 1
        return g




def graph_to_bytes(g: _ShardGraph) -> bytes:
    """Serialize a built graph to npz bytes (for write_segment's
    checksummed put())."""
    arrs: Dict[str, np.ndarray] = {
        "v": g.v.astype(np.float32),
        "ids": g.ids,
        "meta": np.array([g.entry, g.max_level], np.int64),
    }
    if g.raw is not None:
        arrs["raw"] = g.raw
    if g.codes is not None:
        arrs["codes"] = g.codes
    for l, (nb, c) in enumerate(zip(g.nbrs, g.cnt)):
        arrs[f"nbrs{l}"] = nb
        arrs[f"cnt{l}"] = c
    buf = io.BytesIO()
    np.savez(buf, **arrs)
    return buf.getvalue()


def build_graph_bytes(matrix: np.ndarray, ids: np.ndarray) -> bytes:
    """vectors (n, dim) + int64 ids → serialized per-segment graph."""
    return graph_to_bytes(_ShardGraph(matrix, ids))


# -- byte vectors (KnnByteVectorField) ---------------------------------------

BYTE_VECTORS_FILE = "vectors.byte.npz"


def build_byte_vector_bytes(codes: np.ndarray) -> bytes:
    """Signed-byte vectors (n, dim) → serialized flat per-segment
    sidecar — the ``KnnByteVectorField`` storage role
    (``core/document/KnnByteVectorField.java``; flat codes like the
    ``Lucene99FlatVectorsFormat``: byte similarity needs no re-rank
    floats, the codes ARE the exact representation)."""
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    buf = io.BytesIO()
    np.savez(buf, codes=codes)
    return buf.getvalue()


def load_byte_vectors(path: str) -> np.ndarray:
    """→ int8 (n, dim) codes, row == segment-local docid."""
    return np.load(path)["codes"]


def byte_dot_topk(
    codes: np.ndarray,
    q_codes: np.ndarray,
    k: int,
    accept: np.ndarray = None,
) -> List[List[Tuple[int, int]]]:
    """Exact byte-vector top-k per query — ``KnnByteVectorQuery``'s
    scoring over DOT_PRODUCT byte similarity: raw integer dot product
    (monotone with ``VectorUtil.dotProductScore`` for a fixed dim), one
    int32 GEMM per batch, ordered (dot desc, row asc). → per query,
    [(dot, row_index)]."""
    rows = np.arange(len(codes), dtype=np.int64)
    if accept is not None:
        rows = rows[accept]
        if len(rows) == 0:
            return [[] for _ in range(q_codes.shape[0])]
        codes = codes[accept]
    dots = codes.astype(np.int32) @ q_codes.T.astype(np.int32)
    out: List[List[Tuple[int, int]]] = []
    for qi in range(q_codes.shape[0]):
        d = dots[:, qi].astype(np.int64)
        order = np.lexsort((rows, -d))[: min(k, len(rows))]
        out.append([(int(d[j]), int(rows[j])) for j in order])
    return out
