"""Document fingerprinting — winnowing over rolling k-gram hashes
(Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the brief's rolling-hash fingerprint op).

Algorithm: hash every character k-gram, slide a w-window over the hash
sequence, keep the MINIMUM hash of each window (rightmost position on
ties), dedupe → the fingerprint set {(pos, hash)}. Guarantees every
match of length ≥ w+k-1 shares a fingerprint.

Engine shape: one streaming ``map_batches`` over (doc_id, text) — all
per-doc work is vectorized numpy:

- k-gram hash = the plain base-64 polynomial of the char codes
  (fits int64 for k=8 without modular reduction — and is therefore
  EXPRESSIBLE IN ANSI SQL, giving this op a bit-exact DuckDB oracle,
  unlike md5/xxhash-based fingerprints);
- the window minimum with rightmost-tie selection is ONE sliding-window
  min over the composite key ``(h mod 2^42) * 2^21 + (2^21-1 - pos)``:
  minimizing the key minimizes the hash and, among ties, maximizes the
  position. The oracle computes the identical key with a SQL window
  frame (``rows between current row and w-1 following``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

K = 8  # k-gram length (chars)
W = 4  # winnowing window (k-grams)
BASE = 64
_H_MOD = 1 << 42  # hash folded to 42 bits so the composite key fits int64
_P_BITS = 21  # position field of the composite key
_P_MASK = (1 << _P_BITS) - 1
_WEIGHTS = BASE ** np.arange(K - 1, -1, -1, dtype=np.int64)


def _char_codes(text: str) -> np.ndarray:
    if text.isascii():
        return np.frombuffer(text.encode(), np.uint8).astype(np.int64)
    return np.fromiter((ord(c) for c in text), np.int64, len(text))


def winnow(text: str) -> np.ndarray:
    """→ int64[n, 2] of (pos, fp) fingerprints, sorted by pos."""
    n = len(text) - K + 1
    if n < W:
        return np.empty((0, 2), np.int64)
    codes = _char_codes(text)
    from numpy.lib.stride_tricks import sliding_window_view

    h = sliding_window_view(codes, K) @ _WEIGHTS
    key = (h % _H_MOD) * (_P_MASK + 1) + (
        _P_MASK - np.arange(n, dtype=np.int64)
    )
    kmin = sliding_window_view(key, W).min(axis=1)
    pos = _P_MASK - (kmin & _P_MASK)
    fp = kmin >> _P_BITS
    out = np.unique(np.stack([pos, fp], axis=1), axis=0)
    return out


def doc_fingerprints(sf_dir: str):
    """→ Dataset (doc_id, pos, fp): winnowing fingerprints per document,
    one streaming vectorized pass."""
    import ray.data

    docs = os.path.join(sf_dir, "documents.parquet")

    def fp_batch(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_d, out_p, out_f = [], [], []
        for d, t in zip(ids, texts):
            m = winnow(t or "")
            if len(m):
                out_d.append(np.full(len(m), d, np.int64))
                out_p.append(m[:, 0])
                out_f.append(m[:, 1])
        if not out_d:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d)),
                "pos": pa.array(np.concatenate(out_p)),
                "fp": pa.array(np.concatenate(out_f)),
            }
        )

    ds = ray.data.read_parquet(docs, columns=["doc_id", "text"])
    return ds.map_batches(fp_batch, batch_format="pyarrow")


def sql_doc_fingerprints() -> str:
    poly = " + ".join(
        f"cast(ascii(substring(t.text, p.i + {j + 1}, 1)) as bigint)"
        f" * {BASE ** (K - 1 - j)}"
        for j in range(K)
    )
    return f"""
with t as (select doc_id, text, length(text) as L from documents),
pos as (
  select t.doc_id, r.i
  from t, unnest(range(t.L - {K} + 1)) as r(i)
  where t.L >= {K}
),
g as (
  select p.doc_id, p.i, ({poly}) as h
  from pos p join t on t.doc_id = p.doc_id
),
keys as (
  select doc_id, i,
         (h % {_H_MOD}) * {_P_MASK + 1} + ({_P_MASK} - i) as key
  from g
),
wmin as (
  select doc_id,
         min(key) over (partition by doc_id order by i
                        rows between current row and {W - 1} following) as km,
         count(*) over (partition by doc_id order by i
                        rows between current row and {W - 1} following) as cnt
  from keys
),
sel as (
  select distinct doc_id,
         {_P_MASK} - (km % {_P_MASK + 1}) as pos,
         km // {_P_MASK + 1} as fp
  from wmin where cnt = {W}
)
select doc_id, cast(pos as bigint) as pos, cast(fp as bigint) as fp from sel
"""
