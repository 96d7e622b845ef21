"""Range fields — the ``IntRange`` / ``LongRange`` document type and
its relation queries, against a COMMITTED index.

Reference semantics: ``core/document/IntRange.java`` /
``core/search/RangeFieldQuery.java:60-114`` (QueryType INTERSECTS /
WITHIN / CONTAINS / CROSSES over [min, max] interval fields, 2-dim
encoded points in the BKD tree).  One dimension here: each doc carries
an interval ``[lo, hi]``, and a query interval ``[a, b]`` selects docs
by relation:

- INTERSECTS: ``lo <= b and hi >= a``
- WITHIN:     ``lo >= a and hi <= b``   (doc range inside the query)
- CONTAINS:   ``lo <= a and hi >= b``   (doc range covers the query)
- CROSSES:    intersects but neither within nor contains

The synthetic corpus has no interval columns, so intervals derive
deterministically from ``doc_id`` (pure integer arithmetic the SQL
oracle replicates exactly): ``lo = (doc_id * 37) % 1000``,
``hi = lo + 1 + (doc_id * 13) % 120``.

Index-resident path (round 5): ``pipelines/geo_index.py`` builds ONE
committed index whose segments carry a lo-sorted interval sidecar +
hi min-max block directory (``IndexConfig.range_cols``,
index/ranges.py — the BKD leaf-prune equivalent for interval fields),
rebuilt through merges.  Each relation streams through the searcher
actor pool as a :class:`~lucene_ray.search.query.RangeFieldQuery`
node: the ``lo`` constraint is a binary-search slice of the sorted
sidecar, the ``hi`` constraint touches only directory-surviving
blocks — never an O(maxDoc) scan, no per-batch rebuilds.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.pipelines.geo_index import (
    derive_interval,
    get_or_build_geo_index,
)
from lucene_ray.search.query import RangeFieldQuery
from lucene_ray.search.searcher import search_dataset

# query interval + relations (qid order is load-bearing for the oracle)
Q_LO, Q_HI = 200, 420
RELATIONS = ("intersects", "within", "contains", "crosses")


def range_query_factory(spec: str):
    """Picklable query factory: the query column carries the relation
    name; the interval is the fixed gate constant."""
    return RangeFieldQuery("iv", spec, Q_LO, Q_HI)


def _emit_hits(b: pa.Table) -> pa.Table:
    ids = np.asarray(b.column("key").cast(pa.int64()), dtype=np.int64)
    lo, hi = derive_interval(ids)
    return pa.table(
        {
            "qid": b.column("qid").cast(pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
        }
    )


def range_field_search(sf_dir: str):
    """→ (qid, doc_id, lo, hi) for each relation query, ordered by
    (qid, doc_id). qid = index into RELATIONS. Answered by the committed
    index's interval sidecars."""
    import ray.data

    idx = get_or_build_geo_index(sf_dir)
    qds = ray.data.from_items(
        [
            {"qid": qi, "query": rel, "k": 10**9}
            for qi, rel in enumerate(RELATIONS)
        ]
    )
    res = search_dataset(idx, qds, query_factory=range_query_factory)
    return res.map_batches(_emit_hits, batch_format="pyarrow").sort(
        ["qid", "doc_id"]
    )


def sql_range_field_search() -> str:
    return f"""
with iv as (
  select doc_id,
         (doc_id * 37) % 1000 as lo,
         (doc_id * 37) % 1000 + 1 + (doc_id * 13) % 120 as hi
  from documents
),
m as (
  select 0 as qid, doc_id, lo, hi from iv
    where lo <= {Q_HI} and hi >= {Q_LO}
  union all
  select 1, doc_id, lo, hi from iv
    where lo >= {Q_LO} and hi <= {Q_HI}
  union all
  select 2, doc_id, lo, hi from iv
    where lo <= {Q_LO} and hi >= {Q_HI}
  union all
  select 3, doc_id, lo, hi from iv
    where (lo <= {Q_HI} and hi >= {Q_LO})
      and not (lo >= {Q_LO} and hi <= {Q_HI})
      and not (lo <= {Q_LO} and hi >= {Q_HI})
)
select cast(qid as bigint) as qid, doc_id,
       cast(lo as bigint) as lo, cast(hi as bigint) as hi
from m order by qid, doc_id
"""
