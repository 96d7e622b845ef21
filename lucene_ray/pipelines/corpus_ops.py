"""Corpus analytics as Ray Data pipelines + DuckDB oracle SQL.

Covers SURVEY §2.7 aggregations (per-term stats, per-field stats), §2.6
primary-key dedup, and the text-analysis extensions (token counting,
quality metrics, language distribution).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.codecs.smallfloat import LENGTH_TABLE_INT
from lucene_ray.index.manifest import load_manifest
from lucene_ray.index.segment import SegmentReader
from lucene_ray.pipelines.index_cache import get_or_build_index


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


# --------------------------------------------------------------------------
# term stats straight off the index shards — the per-term df/ttf aggregation
# of SURVEY §2.7 (TermStats / blocktree metadata), read Ray-natively from
# the term dictionaries and aggregated across segments.
# --------------------------------------------------------------------------
def term_stats(sf_dir: str):
    import ray.data

    idx = get_or_build_index(sf_dir)
    man = load_manifest(idx)
    term_files = []
    for s in man.segments:
        seg = os.path.join(idx, "segments", f"seg_{s['seg_id']:06d}")
        term_files.extend(
            os.path.join(seg, f)
            for f in os.listdir(seg)
            if f.endswith(".terms.parquet")
        )
    ds = ray.data.read_parquet(term_files, columns=["term", "df", "ttf"])
    from ray.data.aggregate import Sum

    out = ds.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf")
    )
    return out


def sql_term_stats() -> str:
    return """
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
)
select term, count(distinct doc_id)::bigint as df, count(*)::bigint as ttf
from tok group by term
"""


def collection_stats(sf_dir: str):
    """Global field statistics — ``Terms.java:103-121`` semantics, read from
    the committed manifest (aggregated at build time)."""
    idx = get_or_build_index(sf_dir)
    fs = load_manifest(idx).field_stats
    avgdl = np.float32(fs["sum_ttf"] / float(fs["doc_count"]))
    return pa.table(
        {
            "doc_count": pa.array([fs["doc_count"]], pa.int64()),
            "sum_ttf": pa.array([fs["sum_ttf"]], pa.int64()),
            "sum_df": pa.array([fs["sum_df"]], pa.int64()),
            "avgdl": pa.array([float(avgdl)], pa.float32()),
        }
    )


def sql_collection_stats() -> str:
    return """
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
per_doc as (select doc_id, count(*) as len, count(distinct term) as uniq from tok group by doc_id)
select count(*)::bigint as doc_count,
       sum(len)::bigint as sum_ttf,
       sum(uniq)::bigint as sum_df,
       cast(sum(len) / cast(count(*) as double) as float) as avgdl
from per_doc where len > 0
"""


def doc_norms(sf_dir: str):
    """Per-doc SmallFloat norm byte + quantized length, read from the
    segment norms columns (uint8, ``Similarity.java:129-155``) — one Ray
    task per segment (no driver-side corpus concat)."""
    import ray.data

    idx = get_or_build_index(sf_dir)
    man = load_manifest(idx)
    items = [{"seg_id": int(s["seg_id"])} for s in man.segments]

    def read_seg(batch: pa.Table) -> pa.Table:
        out = []
        for sid in batch.column("seg_id").to_pylist():
            seg = SegmentReader(
                os.path.join(idx, "segments", f"seg_{int(sid):06d}")
            )
            nb = seg.norms
            out.append(
                pa.table(
                    {
                        "doc_id": seg.docmap.cast(pa.int64()),
                        "norm_byte": pa.array(nb.astype(np.int32), pa.int32()),
                        "quantized_len": pa.array(LENGTH_TABLE_INT[nb], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    ds = ray.data.from_items(items)
    if len(items) > 1:
        ds = ds.repartition(len(items))
    return ds.map_batches(read_seg, batch_format="pyarrow")


def sql_doc_norms() -> str:
    return """
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
doclen as (select doc_id, count(*)::bigint as len from tok group by doc_id),
alldocs as (
  select d.doc_id, coalesce(l.len, 0) as len
  from documents d left join doclen l using (doc_id)
),
nt as (
  select b, case when b < 24 then b
           else 24 + (case when ((b-24)>>3) - 1 = -1 then (b-24)&7
                      else (((b-24)&7)|8) << (((b-24)>>3) - 1) end)
           end as dec
  from (select unnest(range(256)) as b)
)
select a.doc_id, cast(max(nt.b) as int) as norm_byte,
       max(nt.dec)::bigint as quantized_len
from alldocs a join nt on nt.dec <= a.len
group by a.doc_id
"""


# --------------------------------------------------------------------------
# exact dedup: groupby(content hash) keep lowest key — the build-side
# primary-key dedup of SURVEY §2.6 (updateDocument delete-by-term + add).
# --------------------------------------------------------------------------
def dedup_exact(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        import hashlib

        h = [hashlib.md5(t.encode()).hexdigest() for t in b.column("text").to_pylist()]
        return pa.table(
            {"doc_id": b.column("doc_id"), "text_md5": pa.array(h, pa.string())}
        )

    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(Min("doc_id", alias_name="doc_id"))


def sql_dedup_exact() -> str:
    return "select md5(text) as text_md5, min(doc_id)::bigint as doc_id from documents group by 1"


def lang_counts(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


def sql_lang_counts() -> str:
    return "select lang, count(*)::bigint as n from documents group by lang"


def text_quality(sf_dir: str):
    """Per-doc quality metrics via the engine's analyzer (vectorized
    map_batches): token count, distinct terms, char length, max token len."""
    import ray.data

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    class Quality:
        def __init__(self):
            self.analyzer = Analyzer()

        def __call__(self, b: pa.Table) -> pa.Table:
            n_tok, n_uni, maxlen = [], [], []
            for t in b.column("text").to_pylist():
                terms, _ = self.analyzer.analyze_fast(t or "")
                n_tok.append(len(terms))
                n_uni.append(len(set(terms)))
                maxlen.append(max((len(x) for x in terms), default=0))
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "n_tokens": pa.array(n_tok, pa.int64()),
                    "n_distinct": pa.array(n_uni, pa.int64()),
                    "n_chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
                    "max_token_len": pa.array(maxlen, pa.int64()),
                }
            )

    return ds.map_batches(Quality, batch_format="pyarrow", concurrency=2)


def sql_text_quality() -> str:
    return """
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
agg as (
  select doc_id, count(*)::bigint as n_tokens, count(distinct term)::bigint as n_distinct,
         max(length(term))::bigint as max_token_len
  from tok group by doc_id
)
select d.doc_id, coalesce(a.n_tokens, 0) as n_tokens,
       coalesce(a.n_distinct, 0) as n_distinct,
       length(d.text)::bigint as n_chars,
       coalesce(a.max_token_len, 0) as max_token_len
from documents d left join agg a using (doc_id)
"""
