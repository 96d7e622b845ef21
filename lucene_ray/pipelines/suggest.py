"""Spell suggestion over the documents index — the ``lucene/suggest``
``DirectSpellChecker`` surface (dictionary expansion within an edit
budget, ranked by distance then document frequency).

Runs through the searcher actor pool like every query pipeline: one
row per misspelling, each actor expands its memmapped term dictionaries
(the scan is prefix-bounded, exactly like FuzzyQuery) and emits the
globally-ranked suggestions. DuckDB's ``damerau_levenshtein`` matches
this engine's transposition-aware distance, so the oracle is exact.
"""

from __future__ import annotations

from typing import List, Tuple

import pyarrow as pa

from lucene_ray.cluster import actor_pool
from lucene_ray.pipelines.index_cache import get_or_build_index
from lucene_ray.search.searcher import IndexSearcher

# (qid, misspelled word)
SUGGEST_QUERIES: List[Tuple[int, str]] = [
    (0, "qurey"),    # → query (1 transposition)
    (1, "custmer"),  # → customer (1 deletion)
    (2, "stram"),    # → stream (1 deletion)
    (3, "vlaue"),    # → value (1 transposition)
    (4, "slor"),     # → slow (1) AND sort (2): exercises the ranking
]
SUGGEST_K = 5
MAX_EDITS = 2
PREFIX_LEN = 1


class _SuggestActor:
    """Stateful map_batches actor: open the index once, suggest per row."""

    def __init__(self, index_dir: str):
        self.searcher = IndexSearcher(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_t, out_d, out_f = [], [], [], [], []
        for qid, w in zip(
            batch.column("qid").to_pylist(), batch.column("word").to_pylist()
        ):
            t = self.searcher.suggest(
                w, max_edits=MAX_EDITS, k=SUGGEST_K, prefix_length=PREFIX_LEN
            )
            for r in range(t.num_rows):
                out_q.append(qid)
                out_r.append(r)
                out_t.append(t.column("term")[r].as_py())
                out_d.append(t.column("dist")[r].as_py())
                out_f.append(t.column("df")[r].as_py())
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int32()),
                "rank": pa.array(out_r, pa.int32()),
                "term": pa.array(out_t),
                "dist": pa.array(out_d, pa.int32()),
                "df": pa.array(out_f, pa.int64()),
            }
        )


def spell_suggest(sf_dir: str):
    """→ (qid, rank, term, dist, df) top suggestions per misspelling."""
    import ray.data

    idx = get_or_build_index(sf_dir)
    qds = ray.data.from_items(
        [{"qid": q, "word": w} for q, w in SUGGEST_QUERIES]
    )
    return qds.map_batches(
        _SuggestActor,
        fn_constructor_kwargs={"index_dir": idx},
        concurrency=actor_pool(),
        batch_format="pyarrow",
        batch_size=16,
    )


def sql_spell_suggest() -> str:
    vals = ", ".join(f"({q}, '{w}')" for q, w in SUGGEST_QUERIES)
    return f"""
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
df as (select term, count(distinct doc_id)::bigint as df from tok group by term),
q(qid, w) as (values {vals}),
cand as (
  select q.qid, d.term,
         damerau_levenshtein(d.term, q.w) as dist, d.df
  from q join df d
    on substring(d.term, 1, {PREFIX_LEN}) = substring(q.w, 1, {PREFIX_LEN})
   and d.term <> q.w
   and damerau_levenshtein(d.term, q.w) <= {MAX_EDITS}
),
ranked as (
  select qid, term, dist, df,
         row_number() over (partition by qid
                            order by dist asc, df desc, term asc) as rn
  from cand
)
select cast(qid as int) as qid, cast(rn - 1 as int) as rank, term,
       cast(dist as int) as dist, df
from ranked where rn <= {SUGGEST_K}
"""


# (qid, prefix) — completion lookups
COMPLETE_QUERIES: List[Tuple[int, str]] = [
    (0, "s"),
    (1, "c"),
    (2, "d"),
    (3, "w"),
    (4, "b"),
]
COMPLETE_K = 5


class _CompleteActor:
    """Stateful map_batches actor: open the index once, complete per row."""

    def __init__(self, index_dir: str):
        self.searcher = IndexSearcher(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_t, out_f = [], [], [], []
        for qid, p in zip(
            batch.column("qid").to_pylist(), batch.column("prefix").to_pylist()
        ):
            t = self.searcher.suggest_complete(p, k=COMPLETE_K)
            for r in range(t.num_rows):
                out_q.append(qid)
                out_r.append(r)
                out_t.append(t.column("term")[r].as_py())
                out_f.append(t.column("df")[r].as_py())
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int32()),
                "rank": pa.array(out_r, pa.int32()),
                "term": pa.array(out_t),
                "df": pa.array(out_f, pa.int64()),
            }
        )


def suggest_complete(sf_dir: str):
    """→ (qid, rank, term, df): df-weighted prefix completions — the
    ``lucene/suggest`` ``Lookup``/``AnalyzingSuggester`` surface over the
    committed term dictionaries."""
    import ray.data

    idx = get_or_build_index(sf_dir)
    qds = ray.data.from_items(
        [{"qid": q, "prefix": p} for q, p in COMPLETE_QUERIES]
    )
    return qds.map_batches(
        _CompleteActor,
        fn_constructor_kwargs={"index_dir": idx},
        concurrency=actor_pool(),
        batch_format="pyarrow",
        batch_size=16,
    )


def sql_suggest_complete() -> str:
    values = ", ".join(f"({q}, '{p}')" for q, p in COMPLETE_QUERIES)
    return f"""
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
qs(qid, prefix) as (values {values}),
df as (
  select q.qid, tok.term, count(distinct tok.doc_id)::bigint as df
  from qs q join tok on starts_with(tok.term, q.prefix)
  group by 1, 2
),
ranked as (
  select qid, term, df,
         row_number() over (partition by qid order by df desc, term asc) as rn
  from df
)
select cast(qid as int) as qid, cast(rn - 1 as int) as rank, term, df
from ranked where rn <= {COMPLETE_K}
"""
