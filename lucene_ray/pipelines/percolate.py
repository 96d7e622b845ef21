"""Percolation (reverse search) over the documents stream — the
``lucene/monitor`` + ``lucene/memory`` deployment shape as ONE Ray Data
stage.

A ``map_batches`` ACTOR holds a ``Monitor`` with the registered query
set (built once in ``__init__``); every batch builds a transient
``MemoryIndex`` (one ``invert_texts`` pass over the batch) and streams
out (query_id, doc_id) match pairs. No real index is ever built — the
streaming-ingest shape: route crawl documents to standing topic
subscriptions as they flow by. At 100 TB this is a single pass with
actor-pool parallelism and no shuffle; the registered query set is the
tiny broadcast side (it lives in the actor, not per batch).

Queries cover the Monitor-supported plan shapes: term, conjunction,
phrase, negation, keyword-field filter, prefix (unprunable by the
presearcher → always evaluated).
"""

from __future__ import annotations

import os

from lucene_ray.cluster import actor_pool
from typing import List, Tuple

import pyarrow as pa

from lucene_ray.search.monitor import MemoryIndex, Monitor
from lucene_ray.search.query import IntervalQuery

MONITOR_QUERIES: List[Tuple[int, object]] = [
    (0, "spark"),
    (1, "+batch +stream"),
    (2, '"sort order"'),
    (3, "data -window"),
    (4, "#lang:de +merge"),
    (5, "st*"),
    # minimal-interval subscription (lucene/queries/intervals through the
    # percolator): scan before column with at most 4 gap positions —
    # match iff ANY ordered pair qualifies (a qualifying pair implies a
    # qualifying minimal interval and vice versa), which keeps the SQL
    # oracle a positional EXISTS
    (6, IntervalQuery(
        ("maxgaps", 4, ("ordered", ("term", "scan"), ("term", "column")))
    )),
]


class _PercolateActor:
    """Monitor built once per actor; per batch: MemoryIndex + match."""

    def __init__(self):
        self.monitor = Monitor()
        for qid, qs in MONITOR_QUERIES:
            self.monitor.register(qid, qs)

    def __call__(self, b: pa.Table) -> pa.Table:
        mem = MemoryIndex(
            b.column("text").to_pylist(),
            analyzer=self.monitor.analyzer,
            keyword_cols={"lang": b.column("lang").to_pylist()},
        )
        pairs = self.monitor.match_batch(mem)
        doc_ids = b.column("doc_id").to_pylist()
        return pa.table(
            {
                "query_id": pa.array(
                    [int(q) for _, q in pairs], pa.int32()
                ),
                "doc_id": pa.array(
                    [int(doc_ids[d]) for d, _ in pairs], pa.int64()
                ),
            }
        )


def percolate_docs(sf_dir: str):
    """→ (query_id, doc_id): every registered query matched against every
    document, evaluated stream-side (no index)."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return ds.map_batches(
        _PercolateActor,
        batch_format="pyarrow",
        concurrency=actor_pool(),
        batch_size=512,
    ).sort(["query_id", "doc_id"])


def sql_percolate_docs() -> str:
    return """
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
m as (
  select 0 as qid, doc_id from tok where term = 'spark'
  union
  select 1, doc_id from (
    select doc_id from tok where term = 'batch'
    intersect
    select doc_id from tok where term = 'stream'
  )
  union
  select 2, doc_id from documents
  where (' ' || text || ' ') like '% sort order %'
  union
  select 3, doc_id from (
    select doc_id from tok where term = 'data'
    except
    select doc_id from tok where term = 'window'
  )
  union
  select 4, doc_id from documents
  where lang = 'de' and doc_id in (select doc_id from tok where term = 'merge')
  union
  select 5, doc_id from tok where term like 'st%'
  union
  select 6, doc_id from (
    select doc_id, i as pos, ws[i+1] as term from (
      select doc_id, string_split(text, ' ') as ws from documents
    ), unnest(range(array_length(ws))) as t(i)
  ) a
  where a.term = 'scan' and exists (
    select 1 from (
      select doc_id, i as pos, ws[i+1] as term from (
        select doc_id, string_split(text, ' ') as ws from documents
      ), unnest(range(array_length(ws))) as t(i)
    ) b
    where b.doc_id = a.doc_id and b.term = 'column'
      and b.pos > a.pos and b.pos - a.pos - 1 <= 4
  )
)
select cast(qid as int) as query_id, doc_id from m
"""
