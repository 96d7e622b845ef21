"""Query-time joins over the documents index — the ``lucene/join``
module surface re-expressed Ray-Data-first.

Two operators:

- ``join_search`` — ``JoinUtil.createJoinQuery`` (ScoreMode.NONE,
  ``lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:
  61-107``): from-side query → distinct join-key doc values → to-side
  keyword-terms disjunction. Each join runs inside the searcher actor
  pool (``JoinQuery`` is rewritten per actor against its memmapped
  segments), so the query workload fans out exactly like every other
  query pipeline; the collected key set is small by construction
  (distinct values of a join field).
- ``block_join_topk`` — ``ToParentBlockJoinQuery`` (ScoreMode.Max,
  ``lucene/join/.../ToParentBlockJoinQuery.java``): parents = the
  values of a doc-values field, each scored with the float32 MAX of its
  children's BM25 scores for the child query (max is order-free, so the
  DuckDB oracle hash-matches); the best child is carried along.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from lucene_ray.pipelines.index_cache import get_or_build_index
from lucene_ray.pipelines.search_queries import MF_CONFIG, _PRELUDE
from lucene_ray.search.query import JoinQuery
from lucene_ray.search.searcher import IndexSearcher, search_dataset

# (qid, from_query, from_field, to_field) — from-queries compose term,
# keyword-filter, and phrase shapes; selectivity spans 50%-of-keys,
# most-keys, all-keys, and empty
JOIN_SPECS: List[Tuple[int, str, str, str]] = [
    (0, "+dup #lang:en", "source", "source"),
    (1, '"merge sort"', "source", "source"),
    (2, "+batch +stream", "lang", "lang"),
    (3, "zzzabsent", "source", "source"),  # empty from-side → empty join
]

BJ_CHILD_QUERY = "data"
BJ_PARENT_FIELD = "source"
BJ_K = 3


def make_join_query(spec: str) -> JoinQuery:
    """Picklable query factory for the actor pool; the spec string packs
    ``from_field|to_field|from_query``."""
    from_field, to_field, from_query = spec.split("|", 2)
    return JoinQuery(
        from_query=from_query, from_field=from_field, to_field=to_field
    )


def join_search(sf_dir: str):
    """→ (qid, doc_id) to-side match sets of the JoinUtil specs."""
    import ray.data

    idx = get_or_build_index(sf_dir, MF_CONFIG)
    qds = ray.data.from_items(
        [
            {"qid": qid, "query": f"{ff}|{tf}|{fq}", "k": 10**9}
            for qid, fq, ff, tf in JOIN_SPECS
        ]
    )
    res = search_dataset(idx, qds, query_factory=make_join_query)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": b.column("qid").cast(pa.int32()),
                "doc_id": b.column("key").cast(pa.int64()),
            }
        )

    return res.map_batches(rename, batch_format="pyarrow")


def sql_join_search() -> str:
    return """
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
s0 as (
  select distinct d.source from documents d
  where d.lang = 'en'
    and exists (select 1 from tok t where t.doc_id = d.doc_id and t.term = 'dup')
),
s1 as (
  select distinct source from documents
  where (' ' || text || ' ') like '% merge sort %'
),
l2 as (
  select distinct d.lang from documents d
  where exists (select 1 from tok t where t.doc_id = d.doc_id and t.term = 'batch')
    and exists (select 1 from tok t where t.doc_id = d.doc_id and t.term = 'stream')
),
m as (
  select 0 as qid, doc_id from documents where source in (select source from s0)
  union all
  select 1 as qid, doc_id from documents where source in (select source from s1)
  union all
  select 2 as qid, doc_id from documents where lang in (select lang from l2)
)
select cast(qid as int) as qid, doc_id from m
"""


def block_join_topk(sf_dir: str):
    """→ (rank, source, doc_id, score): top parents by max child BM25."""
    idx = get_or_build_index(sf_dir, MF_CONFIG)
    s = IndexSearcher(idx)
    t = s.parent_topk(BJ_CHILD_QUERY, BJ_PARENT_FIELD, k=BJ_K)
    return pa.table(
        {
            "rank": t.column("rank"),
            "source": t.column("parent"),
            "doc_id": t.column("key").cast(pa.int64()),
            "score": t.column("score"),
        }
    )


def sql_block_join_topk() -> str:
    """Bit-exact oracle: the same float32 single-term BM25 algebra as
    ``sql_bm25_topk``, max per parent (exact — no accumulation), best
    child by (score desc, doc_id asc), parents by (score desc, source)."""
    return f"""{_PRELUDE},
tf1 as (
  select tok.doc_id, count(*)::bigint as tf from tok
  where tok.term = '{BJ_CHILD_QUERY}' group by 1
),
df1 as (select count(distinct doc_id) as df from tok where term = '{BJ_CHILD_QUERY}'),
sc as (
  select tf1.doc_id,
         w.w - w.w / (cast(1 as float) + cast(tf1.tf as float) * f.inv) as s
  from tf1
  cross join (
    select cast(ln(1 + ((select doc_count from stats) - df + 0.5) / (df + 0.5))
                as float) as w
    from df1
  ) w
  join fnorm f on f.doc_id = tf1.doc_id
),
best as (
  select d.source, t.doc_id, t.s,
         row_number() over (partition by d.source order by t.s desc, t.doc_id asc) as rn
  from sc t join documents d using (doc_id)
),
parents as (
  select source, doc_id, s,
         row_number() over (order by s desc, source asc) as prn
  from best where rn = 1
)
select cast(prn - 1 as int) as rank, source, doc_id, cast(s as float) as score
from parents where prn <= {BJ_K}
"""


def block_join_total(sf_dir: str):
    """→ (rank, source, n_children, total_bp, avg_bp): parents ranked by
    the SUM of their children's scores (ScoreMode.Total; avg_bp is the
    ScoreMode.Avg view of the same aggregate) — child scores quantized
    to integer basis points so the sums are order-free and hash-exact."""
    idx = get_or_build_index(sf_dir, MF_CONFIG)
    s = IndexSearcher(idx)
    t = s.parent_topk_agg(BJ_CHILD_QUERY, BJ_PARENT_FIELD, k=BJ_K)
    return pa.table(
        {
            "rank": t.column("rank"),
            "source": t.column("parent"),
            "n_children": t.column("n_children"),
            "total_bp": t.column("total_bp"),
            "avg_bp": t.column("avg_bp"),
        }
    )


def sql_block_join_total() -> str:
    return f"""{_PRELUDE},
tf1 as (
  select tok.doc_id, count(*)::bigint as tf from tok
  where tok.term = '{BJ_CHILD_QUERY}' group by 1
),
df1 as (select count(distinct doc_id) as df from tok where term = '{BJ_CHILD_QUERY}'),
sc as (
  select tf1.doc_id,
         cast(floor(cast(w.w - w.w / (cast(1 as float) + cast(tf1.tf as float) * f.inv)
                         as double) * 10000 + 0.5) as bigint) as bp
  from tf1
  cross join (
    select cast(ln(1 + ((select doc_count from stats) - df + 0.5) / (df + 0.5))
                as float) as w
    from df1
  ) w
  join fnorm f on f.doc_id = tf1.doc_id
),
agg as (
  select d.source, count(*)::bigint as n_children, sum(t.bp)::bigint as total_bp
  from sc t join documents d using (doc_id)
  group by d.source
),
parents as (
  select source, n_children, total_bp,
         row_number() over (order by total_bp desc, source asc) as prn
  from agg
)
select cast(prn - 1 as int) as rank, source, n_children, total_bp,
       (total_bp // n_children)::bigint as avg_bp
from parents where prn <= {BJ_K}
"""


def block_join_children(sf_dir: str):
    """→ (source, doc_id, score): ToChildBlockJoin — the top-``BJ_K``
    parents (by max child BM25, same selection as ``block_join_topk``)
    fan BACK OUT to every one of their child docs, each child carrying
    its parent's score (``join/ToChildBlockJoinQuery.java`` parent-score
    propagation). Children are enumerated from the INDEX (a
    constant-score ``TermInSetQuery`` over the parent keyword field),
    not by re-reading stored fields. Ordered by (score desc, source,
    doc_id)."""
    from lucene_ray.search.query import TermInSetQuery

    idx = get_or_build_index(sf_dir, MF_CONFIG)
    s = IndexSearcher(idx)
    t = s.parent_topk(BJ_CHILD_QUERY, BJ_PARENT_FIELD, k=BJ_K)
    parents = {
        p: float(sc)
        for p, sc in zip(
            t.column("parent").to_pylist(), t.column("score").to_pylist()
        )
    }
    r = s.search(
        TermInSetQuery(BJ_PARENT_FIELD, tuple(parents)),
        k=10**9,
        mode="exhaustive",
    )
    # which parent each child belongs to: read the keyword DV column of
    # the match set (the child block's parent pointer) — one vectorized
    # take per segment, not a per-doc point lookup
    docids = np.asarray(r["docids"], dtype=np.int64)
    srcs = np.empty(len(docids), dtype=object)
    for seg in s.segments:
        m = (docids >= seg.base_docid) & (
            docids < seg.base_docid + seg.n_docs
        )
        if m.any():
            srcs[m] = (
                seg.dv(BJ_PARENT_FIELD)
                .take(pa.array(docids[m] - seg.base_docid))
                .to_pylist()
            )
    doc_ids = np.asarray(r["keys"], dtype=np.int64)
    scores = np.array([parents[x] for x in srcs], dtype=np.float32)
    order = np.lexsort((doc_ids, np.asarray(srcs, dtype=object), -scores.astype(np.float64)))
    return pa.table(
        {
            "source": pa.array(np.asarray(srcs, dtype=object)[order], pa.string()),
            "doc_id": pa.array(doc_ids[order], pa.int64()),
            "score": pa.array(scores[order], pa.float32()),
        }
    )


def sql_block_join_children() -> str:
    """Children of the top-K parents, parent score propagated —
    float32-exact via the ``sql_block_join_topk`` parent selection."""
    return f"""{_PRELUDE},
tf1 as (
  select tok.doc_id, count(*)::bigint as tf from tok
  where tok.term = '{BJ_CHILD_QUERY}' group by 1
),
df1 as (select count(distinct doc_id) as df from tok where term = '{BJ_CHILD_QUERY}'),
sc as (
  select tf1.doc_id,
         w.w - w.w / (cast(1 as float) + cast(tf1.tf as float) * f.inv) as s
  from tf1
  cross join (
    select cast(ln(1 + ((select doc_count from stats) - df + 0.5) / (df + 0.5))
                as float) as w
    from df1
  ) w
  join fnorm f on f.doc_id = tf1.doc_id
),
best as (
  select d.source, t.s,
         row_number() over (partition by d.source order by t.s desc, t.doc_id asc) as rn
  from sc t join documents d using (doc_id)
),
parents as (
  select source, s, row_number() over (order by s desc, source asc) as prn
  from best where rn = 1
)
select p.source, d.doc_id, cast(p.s as float) as score
from parents p join documents d on d.source = p.source
where p.prn <= {BJ_K}
order by score desc, p.source, d.doc_id
"""
