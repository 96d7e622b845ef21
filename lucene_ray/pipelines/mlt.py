"""MoreLikeThis — the ``lucene/queries`` MLT surface
(``lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java``): select the seed document's most interesting
terms, build a SHOULD disjunction, search, exclude the seed.

Deterministic, oracle-exact spec (documented divergence from the
reference's ``tf·idf`` interestingness):

- interestingness = ``tf_seed / (df + 1)`` (monotone in tf, decreasing
  in df — the same ordering intent, but rational arithmetic is
  IEEE-identical between numpy and DuckDB, unlike ``ln`` whose last
  ulp differs across libm builds), ties by term asc;
- top ``TERMS_K`` terms become SHOULD clauses IN RANK ORDER (the
  engine's float32 disjunction sums in clause order, so the oracle can
  replicate the exact left-associative accumulation);
- the seed is excluded from the hits (search k+1, drop seed, keep k —
  equivalent to ranking over all non-seed docs for any seed position).

The seed text is read with predicate pushdown (never the whole table)
and analyzed with the index analyzer — the reference's
stored-field/term-vector path.
"""

from __future__ import annotations

import os
from collections import Counter
from typing import List, Tuple

import pyarrow as pa

from lucene_ray.pipelines.index_cache import get_or_build_index
from lucene_ray.pipelines.search_queries import _PRELUDE
from lucene_ray.search.query import SHOULD, BooleanQuery, TermQuery
from lucene_ray.search.searcher import IndexSearcher

MLT_SEEDS: List[Tuple[int, int]] = [(0, 7), (1, 42), (2, 123)]
TERMS_K = 5
K = 10


def _seed_text(sf_dir: str, doc_id: int) -> str:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "=", doc_id)],
    )
    return t.column("text")[0].as_py() if t.num_rows else ""


def mlt_terms(searcher: IndexSearcher, text: str, terms_k: int = TERMS_K):
    """→ the seed's top terms [(term, tf)] by (tf/(df+1) desc, term asc)."""
    terms, _ = searcher.analyzer.analyze_fast(text)
    tf = Counter(terms)
    states = searcher.term_states(sorted(tf))
    scored = []
    for term, f in tf.items():
        df = searcher.global_df(states[term])
        if df == 0:
            continue
        scored.append((-(f / (df + 1.0)), term, f))
    scored.sort()
    return [(t, f) for _, t, f in scored[:terms_k]]


def more_like_this(sf_dir: str):
    """→ (qid, rank, doc_id, score) top-k similar docs per seed."""
    idx = get_or_build_index(sf_dir)
    s = IndexSearcher(idx)
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, seed in MLT_SEEDS:
        sel = mlt_terms(s, _seed_text(sf_dir, seed))
        q = BooleanQuery(tuple((SHOULD, TermQuery(t)) for t, _ in sel))
        r = s.search(q, k=K + 1, mode="exhaustive")
        rank = 0
        for key, score in zip(r["keys"], r["scores"]):
            if int(key) == seed:
                continue
            if rank >= K:
                break
            out_q.append(qid)
            out_r.append(rank)
            out_d.append(int(key))
            out_s.append(float(score))
            rank += 1
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int32()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )


def sql_more_like_this() -> str:
    seeds = ", ".join(f"({q}, {d})" for q, d in MLT_SEEDS)
    # left-associative float32 sum in selection-rank (ti) order
    acc = "coalesce(max(s) filter (where ti = 0), cast(0 as float))"
    for i in range(1, TERMS_K):
        acc = f"({acc} + coalesce(max(s) filter (where ti = {i}), cast(0 as float)))"
    return f"""{_PRELUDE},
seeds(qid, seed) as (values {seeds}),
seed_tf as (
  select s.qid, s.seed, tok.term, count(*)::bigint as tf
  from seeds s join tok on tok.doc_id = s.seed
  group by 1, 2, 3
),
alldf as (select term, count(distinct doc_id)::bigint as df from tok group by term),
qterms as (
  select qid, seed, term, ti from (
    select st.qid, st.seed, st.term,
           row_number() over (partition by st.qid
                              order by st.tf / (d.df + 1.0) desc, st.term asc)
             - 1 as ti
    from seed_tf st join alldf d using (term)
  ) where ti < {TERMS_K}
),
tf as (
  select q.qid, q.ti, tok.doc_id, count(*)::bigint as tf
  from qterms q join tok on tok.term = q.term
  group by 1, 2, 3
),
tscore as (
  select tf.qid, tf.ti, tf.doc_id,
         w.w - w.w / (cast(1 as float) + cast(tf.tf as float) * f.inv) as s
  from tf
  join qterms q on q.qid = tf.qid and q.ti = tf.ti
  join (
    select d.term,
           cast(ln(1 + ((select doc_count from stats) - d.df + 0.5) / (d.df + 0.5)) as float) as w
    from alldf d
  ) w on w.term = q.term
  join fnorm f on f.doc_id = tf.doc_id
),
summed as (
  select qid, doc_id, {acc} as score
  from tscore group by qid, doc_id
),
ranked as (
  select sm.qid, sm.doc_id, sm.score,
         row_number() over (partition by sm.qid
                            order by sm.score desc, sm.doc_id asc) as rn
  from summed sm
  join seeds se on se.qid = sm.qid
  where sm.doc_id <> se.seed
)
select cast(qid as int) as qid, cast(rn - 1 as int) as rank, doc_id,
       cast(score as float) as score
from ranked where rn <= {K}
"""


def more_like_this_tv(sf_dir: str):
    """MLT from STORED TERM VECTORS — the reference's primary path
    (``MoreLikeThis.java`` ``retrieveTerms(int docNum)`` reads
    ``IndexReader.getTermVector``): seed term freqs come from the
    index's ``tv.parquet`` row store instead of re-reading and
    re-analyzing the document text. Selection, scoring, and exclusion
    are identical to ``more_like_this``, so the same oracle applies —
    the gate proves vector-sourced tf ≡ re-analysis tf end-to-end."""
    import numpy as np
    import pyarrow.compute as pc

    from lucene_ray.pipelines.search_queries import TV_CONFIG

    idx = get_or_build_index(sf_dir, TV_CONFIG)
    s = IndexSearcher(idx)

    def seed_tf_from_tv(seed_key: int):
        want = pa.array([seed_key], pa.int64())
        for seg in s.segments:
            hit = np.flatnonzero(
                pc.is_in(seg.docmap.cast(pa.int64()), value_set=want)
            )
            if len(hit):
                t = seg.term_vector(int(hit[0]))
                return dict(
                    zip(
                        t.column("term").to_pylist(),
                        t.column("freq").to_pylist(),
                    )
                )
        return {}

    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, seed in MLT_SEEDS:
        tf = seed_tf_from_tv(seed)
        states = s.term_states(sorted(tf))
        scored = []
        for term, f in tf.items():
            df = s.global_df(states[term])
            if df == 0:
                continue
            scored.append((-(f / (df + 1.0)), term, f))
        scored.sort()
        sel = [(t, f) for _, t, f in scored[:TERMS_K]]
        q = BooleanQuery(tuple((SHOULD, TermQuery(t)) for t, _ in sel))
        r = s.search(q, k=K + 1, mode="exhaustive")
        rank = 0
        for key, score in zip(r["keys"], r["scores"]):
            if int(key) == seed:
                continue
            if rank >= K:
                break
            out_q.append(qid)
            out_r.append(rank)
            out_d.append(int(key))
            out_s.append(float(score))
            rank += 1
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int32()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float32()),
        }
    )
