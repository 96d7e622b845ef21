"""Deduplication suite over the ``documents`` table — the training-data
pipeline operators the task brief lists as first-class: exact (see
``corpus_ops.dedup_exact``), MinHash+LSH near-dup, SimHash, blocked
n-gram Jaccard, embedding-cosine near-dup.

Scale shapes:
- MinHash: signatures per batch (``map_batches``), explode to
  ``(band, band_hash, doc_id)`` rows, ``groupby`` band buckets → candidate
  pairs → exact-Jaccard verify (candidates only) — the standard
  shingle→minhash→band→bucket plan from the brief.
- SimHash: 64-bit fingerprints per batch; Hamming-close pairs by XOR
  popcount over block pairs.
- Blocked Jaccard: all-pairs only *within* a blocking key (``source``) via
  ``groupby(source).map_groups`` — the exact-verification complement.
- Embedding near-dup: normalized matmul per batch against a broadcast
  matrix (``ray.put`` once).

All hashing is seeded/stable (crc32 / blake2b), never Python ``hash``.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from typing import Dict, List, Set, Tuple

import numpy as np
import pyarrow as pa

N_PERM = 128
N_BANDS = 32  # 4 rows per band
SHINGLE_W = 3
JACCARD_TAU = 0.8

_MERSENNE = (1 << 61) - 1


def _perm_params(seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64)
    return a, b


def shingles(text: str, w: int = SHINGLE_W) -> Set[str]:
    toks = text.split()
    if len(toks) < w:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def shingle_hashes(text: str) -> np.ndarray:
    return np.array(
        sorted(zlib.crc32(s.encode()) for s in shingles(text)), dtype=np.int64
    )


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(hashes) == 0:
        return np.full(N_PERM, np.iinfo(np.int64).max, dtype=np.int64)
    # (a*h + b) mod p over the 61-bit Mersenne prime, vectorized
    vals = (a[:, None] * (hashes[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def _band_rows(doc_id: int, sig: np.ndarray):
    rows_per = N_PERM // N_BANDS
    for band in range(N_BANDS):
        chunk = sig[band * rows_per : (band + 1) * rows_per]
        h = zlib.crc32(chunk.tobytes())
        yield band, h, doc_id


def minhash_lsh_dedup(sf_dir: str):
    """→ (a, b, j_bp): near-duplicate pairs with exact word-3-gram Jaccard
    ≥ 0.8, candidates found via MinHash banding (32 bands × 4 rows ⇒
    detection prob ≈ 1 − (1 − 0.8⁴)³² ≈ 1-5e-8 at the threshold).

    ``j_bp = floor(jaccard * 10000)`` — floor (not round) so the DuckDB
    oracle's float64 division floors identically.
    """
    import ray
    import ray.data

    a_p, b_p = _perm_params()

    def sigs(batch: pa.Table) -> pa.Table:
        bands, hashes, ids = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = minhash_signature(shingle_hashes(text or ""), a_p, b_p)
            for band, h, d in _band_rows(int(doc_id), sig):
                bands.append(band)
                hashes.append(h)
                ids.append(d)
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "bh": pa.array(hashes, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    band_rows = ds.map_batches(sigs, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pa.table(
            {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
        )

    pairs = (
        band_rows.groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )

    # exact verification on candidates only (re-read involved docs)
    import pyarrow.parquet as pq

    involved = sorted(set(pairs["a"]) | set(pairs["b"])) if len(pairs) else []
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    sh: Dict[int, Set[str]] = {d: shingles(texts[d] or "") for d in involved}
    out = []
    for a, b in zip(pairs.get("a", []), pairs.get("b", [])):
        sa, sb = sh[int(a)], sh[int(b)]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union
        if j >= JACCARD_TAU:
            out.append((int(a), int(b), int(np.floor(j * 10000))))
    out.sort()
    return pa.table(
        {
            "a": pa.array([x[0] for x in out], pa.int64()),
            "b": pa.array([x[1] for x in out], pa.int64()),
            "j_bp": pa.array([x[2] for x in out], pa.int64()),
        }
    )


def sql_minhash_lsh_dedup() -> str:
    """Exact all-pairs trigram Jaccard ≥ τ — ground truth the LSH plan must
    reproduce (detection probability leaves ~5e-8 miss chance)."""
    return f"""
with w as (
  select doc_id, string_split(text, ' ') as ws from documents
),
sh as (
  select distinct doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] as shingle
  from w, unnest(range(greatest(array_length(ws) - 2, 0))) as t(i)
),
short as (
  select doc_id, text as shingle from documents
  where array_length(string_split(text, ' ')) < 3 and text <> ''
),
allsh as (select * from sh union select * from short),
sizes as (select doc_id, count(*) as n from allsh group by doc_id),
inter as (
  select x.doc_id as a, y.doc_id as b, count(*) as i
  from allsh x join allsh y on x.shingle = y.shingle and x.doc_id < y.doc_id
  group by 1, 2
)
select a, b,
       cast(floor(i * 10000.0 / (sa.n + sb.n - i)) as bigint) as j_bp
from inter join sizes sa on sa.doc_id = a join sizes sb on sb.doc_id = b
where i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_TAU}
order by a, b
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def _term_hash64(term: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(term.encode(), digest_size=8).digest(), "little"
    )


def simhash64(text: str, cache: Dict[str, int]) -> int:
    from collections import Counter

    votes = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for term, tf in Counter((text or "").split()).items():
        h = cache.get(term)
        if h is None:
            h = _term_hash64(term)
            cache[term] = h
        bits = (np.uint64(h) >> shifts) & np.uint64(1)
        votes += np.where(bits == 1, tf, -tf)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(sf_dir: str, max_hamming: int = 8):
    """→ (a, b, hamming): doc pairs with SimHash Hamming distance ≤ 8.
    Fingerprints per batch (actor holds the term-hash cache); pair scan by
    XOR+popcount. Non-SQL-expressible → rows-only driver check."""
    import ray.data

    class Fp:
        def __init__(self):
            self.cache: Dict[str, int] = {}

        def __call__(self, b: pa.Table) -> pa.Table:
            fps = [
                np.uint64(simhash64(t, self.cache))
                for t in b.column("text").to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "fp": pa.array(np.array(fps, dtype=np.uint64)),
                }
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    fps = ds.map_batches(Fp, batch_format="pyarrow", concurrency=2).to_pandas()
    # Ray block arrival order is nondeterministic; pin row order so the
    # (a < b) pair orientation is stable across runs
    fps = fps.sort_values("doc_id").reset_index(drop=True)
    ids = fps["doc_id"].to_numpy()
    v = fps["fp"].to_numpy().astype(np.uint64)
    out = []
    for i in range(len(v)):  # row-vs-rest XOR, popcount via unpackbits
        x = v[i] ^ v[i + 1 :]
        if len(x) == 0:
            continue
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        hits = np.flatnonzero(ham <= max_hamming)
        for j in hits:
            out.append((int(ids[i]), int(ids[i + 1 + j]), int(ham[j])))
    out.sort()
    return pa.table(
        {
            "a": pa.array([x[0] for x in out], pa.int64()),
            "b": pa.array([x[1] for x in out], pa.int64()),
            "hamming": pa.array([x[2] for x in out], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# blocked exact n-gram Jaccard (groupby blocking key)
# --------------------------------------------------------------------------
def ngram_jaccard_by_source(sf_dir: str, tau: float = 0.5):
    """→ (a, b, j_bp): exact trigram Jaccard ≥ 0.5 among docs sharing the
    ``source`` blocking key (all-pairs within group via map_groups)."""
    import ray.data

    def per_group(g) -> pa.Table:
        ids = g["doc_id"].tolist()
        shs = [shingles(t or "") for t in g["text"].tolist()]
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                sa, sb = shs[i], shs[j]
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                jv = inter / (len(sa) + len(sb) - inter)
                if jv >= tau:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out.append((a, b, int(np.floor(jv * 10000))))
        out.sort()
        return pa.table(
            {
                "a": pa.array([x[0] for x in out], pa.int64()),
                "b": pa.array([x[1] for x in out], pa.int64()),
                "j_bp": pa.array([x[2] for x in out], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return ds.groupby("source").map_groups(per_group, batch_format="pandas")


def sql_ngram_jaccard_by_source(tau: float = 0.5) -> str:
    return f"""
with w as (
  select doc_id, source, string_split(text, ' ') as ws from documents
),
sh as (
  select distinct doc_id, source,
         ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] as shingle
  from w, unnest(range(greatest(array_length(ws) - 2, 0))) as t(i)
),
short as (
  select doc_id, source, text as shingle from documents
  where array_length(string_split(text, ' ')) < 3 and text <> ''
),
allsh as (select * from sh union select * from short),
sizes as (select doc_id, count(*) as n from allsh group by doc_id),
inter as (
  select x.doc_id as a, y.doc_id as b, count(*) as i
  from allsh x join allsh y
    on x.shingle = y.shingle and x.source = y.source and x.doc_id < y.doc_id
  group by 1, 2
)
select a, b,
       cast(floor(i * 10000.0 / (sa.n + sb.n - i)) as bigint) as j_bp
from inter join sizes sa on sa.doc_id = a join sizes sb on sb.doc_id = b
where i * 1.0 / (sa.n + sb.n - i) >= {tau}
order by a, b
"""


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------
def embedding_near_dup(sf_dir: str, tau: float = 0.45):
    """→ (a, b, c_bp): vector pairs with cosine ≥ τ; per-batch float64
    matmul against the broadcast normalized matrix."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    arr = tbl.column("embedding").combine_chunks()
    full = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
    nrm = np.linalg.norm(full, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    full_n = full / nrm
    full_ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
    ref = ray.put((full_n, full_ids))

    def score(b: pa.Table) -> pa.Table:
        mat, all_ids = ray.get(ref)
        a = b.column("embedding").combine_chunks()
        emb = np.asarray(a.values, dtype=np.float64).reshape(len(a), -1)
        n = np.linalg.norm(emb, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (emb / n) @ mat.T
        my_ids = np.asarray(b.column("vec_id"), dtype=np.int64)
        oa, ob, oc = [], [], []
        for i in range(len(my_ids)):
            hits = np.flatnonzero(sims[i] >= tau)
            for j in hits:
                x, y = int(my_ids[i]), int(all_ids[j])
                if x < y:
                    oa.append(x)
                    ob.append(y)
                    oc.append(int(np.floor(sims[i, j] * 10000)))
        return pa.table(
            {
                "a": pa.array(oa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "c_bp": pa.array(oc, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return ds.map_batches(score, batch_format="pyarrow", batch_size=2048)


def sql_embedding_near_dup(tau: float = 0.45) -> str:
    return f"""
select a.vec_id as a, b.vec_id as b,
       cast(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000) as bigint) as c_bp
from embeddings a join embeddings b on a.vec_id < b.vec_id
where list_cosine_similarity(a.embedding, b.embedding) >= {tau}
order by a, b
"""
