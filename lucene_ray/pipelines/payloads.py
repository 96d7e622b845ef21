"""Payload-scored search — ``PayloadScoreQuery`` end to end.

Reference: payload bytes are the remaining half of the ``.pay`` stream
(``core/codecs/lucene104/Lucene104PostingsFormat.java:17-80``), written
from ``PayloadAttribute`` on the token stream and scored by
``lucene/queries/src/java/org/apache/lucene/queries/payloads/PayloadScoreQuery.java``
(payloads decoded per matching occurrence, reduced by a
``PayloadFunction`` — Max/Min/Sum; with ``includeSpanScore=false`` the
reduction IS the score).

Ray mapping: payloads enter through the fork's columnar
``TokenStreamColumn`` path (``core/document/column/package-info.java:30-50``)
as a ``list<binary>`` column aligned 1:1 with the token column — the
columnar analogue of ``DelimitedPayloadTokenFilter`` output. The
documents table carries no payloads, so the gate pipeline derives them
deterministically: token k of a doc (1-based) carries the 4-byte
big-endian integer k (the ``PayloadHelper`` int encoding) — i.e. the
payload is the occurrence's ordinal, which makes Max/Min/Sum
SQL-expressible over ``generate_subscripts``.

The derivation is one vectorized Arrow kernel inside ``map_batches``
(split → flatten → arange ordinals → zero-copy binary buffers); the
tagged corpus streams to scratch parquet feeding the standard
partitioned build, exactly like ``facet_multi``.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from lucene_ray.index.config import IndexConfig
from lucene_ray.pipelines.index_cache import CACHE_ROOT

PAY_CONFIG = IndexConfig(
    rows_per_segment=2048,
    num_buckets=2,
    text_col="tokens",
    pretokenized=True,
    positions=True,
    payloads=True,
    payload_col="payloads",
)

K = 10

# (qid, term, payload function) — exercises Max/Min/SumPayloadFunction
PAYLOAD_QUERIES: List[Tuple[int, str, str]] = [
    (0, "data", "max"),
    (1, "spark", "max"),
    (2, "merge", "sum"),
    (3, "window", "min"),
]


def derive_token_payloads(b: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized payload-ingest kernel: (doc_id, text) →
    (doc_id, tokens list<string>, payloads list<binary>) where token k
    (1-based) carries big-endian uint32(k)."""
    import pyarrow.compute as pc

    text = b.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens).astype(np.int64)
    new_offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    flat = pc.list_flatten(toks)
    n_flat = len(flat)
    tokens = pa.ListArray.from_arrays(pa.array(new_offs), flat)
    # per-token 1-based ordinal, big-endian 4-byte (PayloadHelper int)
    starts = np.repeat(new_offs[:-1].astype(np.int64), lens)
    ords = (np.arange(n_flat, dtype=np.int64) - starts + 1).astype(">u4")
    boffs = (4 * np.arange(n_flat + 1, dtype=np.int32))
    pay_values = pa.Array.from_buffers(
        pa.binary(),
        n_flat,
        [None, pa.py_buffer(boffs.tobytes()), pa.py_buffer(ords.tobytes())],
    )
    payloads = pa.ListArray.from_arrays(pa.array(new_offs), pay_values)
    return pa.table(
        {
            "doc_id": b.column("doc_id"),
            "tokens": tokens,
            "payloads": payloads,
        }
    )


def payload_corpus(sf_dir: str) -> str:
    """documents → (tokens, ordinal payloads) scratch parquet (cached)."""
    import ray.data

    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"paycorp:{os.path.abspath(docs)}:{os.path.getmtime(docs)}".encode()
    ).hexdigest()[:16]
    out = os.path.join(CACHE_ROOT, f"paycorp_{tag}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    (
        ray.data.read_parquet(docs, columns=["doc_id", "text"])
        .map_batches(
            derive_token_payloads, batch_format="pyarrow", batch_size=4096
        )
        .write_parquet(out)
    )
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    return out


def payload_index(sf_dir: str) -> str:
    corpus = payload_corpus(sf_dir)
    tag = hashlib.sha1(
        f"payidx:{corpus}:{sorted(PAY_CONFIG.to_json().items())}".encode()
    ).hexdigest()[:16]
    idx = os.path.join(CACHE_ROOT, f"payidx_{tag}")
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        from lucene_ray.index.build import build_index

        build_index(
            [
                os.path.join(corpus, f)
                for f in os.listdir(corpus)
                if f.endswith(".parquet")
            ],
            idx,
            PAY_CONFIG,
        )
    return idx


def payload_boosted_topk(sf_dir: str):
    """Driver-gate entry: PayloadScoreQuery (includeSpanScore=false)
    per query term/function → (qid, rank, doc_id, payload_score)."""
    from lucene_ray.search.searcher import IndexSearcher

    idx = payload_index(sf_dir)
    s = IndexSearcher(idx)
    qids, ranks, dids, scores = [], [], [], []
    for qid, term, fn in PAYLOAD_QUERIES:
        t = s.payload_topk(term, k=K, func=fn)
        n = t.num_rows
        qids.extend([qid] * n)
        ranks.extend(t.column("rank").to_pylist())
        dids.extend(t.column("key").to_pylist())
        scores.extend(t.column("payload_score").to_pylist())
    return pa.table(
        {
            "qid": pa.array(qids, pa.int32()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(dids, pa.int64()),
            "payload_score": pa.array(scores, pa.int64()),
        }
    )


def sql_payload_boosted_topk() -> str:
    qvals = ", ".join(
        f"({qid}, '{term}', '{fn}')" for qid, term, fn in PAYLOAD_QUERIES
    )
    return f"""
with tl as (select doc_id, string_split(text, ' ') as l from documents),
tok as (
  select doc_id, unnest(l) as term, generate_subscripts(l, 1) as ord from tl
),
q(qid, term, fn) as (values {qvals}),
agg as (
  select q.qid, t.doc_id,
         case q.fn when 'max' then max(t.ord)
                   when 'min' then min(t.ord)
                   else sum(t.ord) end as ps
  from tok t join q on q.term = t.term
  group by q.qid, t.doc_id, q.fn
),
ranked as (
  select qid, doc_id, cast(ps as bigint) as payload_score,
         row_number() over (
           partition by qid order by ps desc, doc_id asc
         ) as rn
  from agg
)
select cast(qid as int) as qid, cast(rn - 1 as int) as rank, doc_id,
       payload_score
from ranked where rn <= {K}
"""
