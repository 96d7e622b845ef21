"""Range fields — the ``IntRange`` / ``LongRange`` document type and
its relation queries.

Reference semantics: ``core/document/IntRange.java`` /
``core/document/RangeFieldQuery.java:60-114`` (QueryType INTERSECTS /
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

Scale shape: a vectorized integer-compare ``map_batches`` filter; at
100 TB the same predicate runs against the 1-D point sidecar
(``index/points.py``) on ``lo`` (sorted: ``lo <= b`` is a prefix
slice) with the ``hi`` compare as the in-block refine — the BKD
leaf-prune equivalent for interval fields.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# query interval + relations (qid order is load-bearing for the oracle)
Q_LO, Q_HI = 200, 420
RELATIONS = ("intersects", "within", "contains", "crosses")


def derive_interval(ids: np.ndarray):
    lo = (ids * 37) % 1000
    hi = lo + 1 + (ids * 13) % 120
    return lo, hi


def range_field_search(sf_dir: str):
    """→ (qid, doc_id, lo, hi) for each relation query, ordered by
    (qid, doc_id). qid = index into RELATIONS."""
    import ray.data

    def stage(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        lo, hi = derive_interval(ids)
        inter = (lo <= Q_HI) & (hi >= Q_LO)
        within = (lo >= Q_LO) & (hi <= Q_HI)
        contains = (lo <= Q_LO) & (hi >= Q_HI)
        crosses = inter & ~within & ~contains
        qids, sel = [], []
        for qi, m in enumerate((inter, within, contains, crosses)):
            idx = np.flatnonzero(m)
            sel.append(idx)
            qids.append(np.full(len(idx), qi, dtype=np.int64))
        sel = np.concatenate(sel)
        return pa.table(
            {
                "qid": pa.array(np.concatenate(qids)),
                "doc_id": pa.array(ids[sel], pa.int64()),
                "lo": pa.array(lo[sel], pa.int64()),
                "hi": pa.array(hi[sel], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return ds.map_batches(stage, batch_format="pyarrow").sort(
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
