"""Search-result highlighting — the ``lucene/highlight`` module surface
(``lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java``), simplified to a deterministic,
SQL-expressible passage rule so the driver gate can hash-check it:

    passage = the ±20-char window around the FIRST whole-token
    occurrence of the query term in the stored text.

(The reference's passage scorer ranks candidate passages by BM25-ish
term density; first-occurrence-fixed-window is the degenerate
single-term case and is documented as the divergence.)

Ray shape — a three-stage streaming plan:

1. match sets through the searcher actor pool (same path as every
   query pipeline);
2. ``Dataset.join`` of the hits with the stored-text table on doc_id —
   the hash-shuffle equi-join operator (highlighting needs stored
   fields, which live columnar in the source parquet);
3. one pure-Arrow ``map_batches``: per query term,
   ``pyarrow.compute.find_substring`` locates the padded whole-token
   occurrence, then snippets are sliced from only the matched rows —
   no pandas stage anywhere in the path.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import pyarrow as pa

from lucene_ray.search.searcher import IndexSearcher

from lucene_ray.pipelines.index_cache import get_or_build_index
from lucene_ray.search.searcher import search_dataset

HL_QUERIES: List[Tuple[int, str]] = [
    (0, "spark"),
    (1, "vector"),
    (2, "window"),
]
CTX = 20  # snippet context chars each side


def highlight_search(sf_dir: str):
    """→ (qid, doc_id, start_off, end_off, snippet)."""
    import ray.data

    idx = get_or_build_index(sf_dir)
    qds = ray.data.from_items(
        [{"qid": q, "query": t, "k": 10**9} for q, t in HL_QUERIES]
    )
    res = search_dataset(idx, qds)

    def hits(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": b.column("qid").cast(pa.int32()),
                "doc_id": b.column("key").cast(pa.int64()),
            }
        )

    hits_ds = res.map_batches(hits, batch_format="pyarrow")
    docs_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    joined = hits_ds.join(
        docs_ds, join_type="inner", num_partitions=4, on=("doc_id",)
    )
    terms = {q: t for q, t in HL_QUERIES}

    def passage(b: pa.Table) -> pa.Table:
        """Arrow passage kernel: per-query-term ``find_substring`` over
        the space-padded text (0-based index of the space before the
        token == the token's start in the unpadded text, instr − 1 in
        SQL), clip to ±CTX chars, slice snippets."""
        import numpy as np
        import pyarrow.compute as pc

        qid = np.asarray(b.column("qid"), dtype=np.int64)
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(b)
        pad = pa.array([" "] * n)
        padded = pc.binary_join_element_wise(pad, text, pad, "")
        tlen = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        s = np.full(n, -1, dtype=np.int64)
        e = np.empty(n, dtype=np.int64)
        for q, t in terms.items():
            rows = np.flatnonzero(qid == q)
            if not len(rows):
                continue
            found = pc.find_substring(
                padded.take(pa.array(rows)), pattern=f" {t} "
            ).to_numpy(zero_copy_only=False)
            s[rows] = found
            e[rows] = found + len(t)
        lo = np.maximum(s - CTX, 0)
        hi = np.minimum(e + CTX, tlen.astype(np.int64))
        texts = text.to_pylist()
        snip = [txt[a:b_] for txt, a, b_ in zip(texts, lo, hi)]
        return pa.table(
            {
                "qid": pa.array(qid, pa.int32()),
                "doc_id": b.column("doc_id"),
                "start_off": pa.array(s, pa.int64()),
                "end_off": pa.array(e, pa.int64()),
                "snippet": pa.array(snip, pa.string()),
            }
        )

    return joined.map_batches(passage, batch_format="pyarrow")


def highlight_offsets(sf_dir: str):
    """→ (qid, doc_id, start_off, end_off, snippet) — the SAME passage
    rule as :func:`highlight_search`, but the match offsets come from the
    INDEX's per-position offsets stream (the ``.pay`` role,
    ``Lucene104PostingsFormat.java:17-80``;
    ``FieldType.storeTermVectorOffsets`` /
    ``IndexOptions..._AND_OFFSETS``), never from re-scanning stored text
    — the reference ``UnifiedHighlighter``'s fast offset source
    (``uhighlight/UnifiedHighlighter.java`` offset-source selection).

    Ray shape: an offsets-enabled index (built once, cached), one actor
    pool emitting (qid, doc_id, start, end) straight from postings+.pay
    decode — first in-doc occurrence is the doc's first offsets entry,
    positions are doc-ordered — then the stored-text join ONLY to slice
    snippet bytes (index-first, text-last: at 100 TB the text join
    touches matched rows only)."""
    import ray.data

    from lucene_ray.cluster import actor_pool
    from lucene_ray.index.build import build_index
    from lucene_ray.index.config import IndexConfig
    from lucene_ray.pipelines.index_cache import index_dir_for

    cfg = IndexConfig(rows_per_segment=2048, offsets=True)
    idx = index_dir_for(sf_dir, cfg) + "_offsets"
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        os.makedirs(idx, exist_ok=True)
        build_index(os.path.join(sf_dir, "documents.parquet"), idx, cfg)

    class _OffsetHits:
        """Per (qid, term) row: decode postings + offsets per segment and
        emit each matching doc's FIRST occurrence char range."""

        def __init__(self):
            self.searcher = IndexSearcher(idx)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np

            o_qid, o_doc, o_s, o_e = [], [], [], []
            for qid, term in zip(
                batch.column("qid").to_pylist(),
                batch.column("query").to_pylist(),
            ):
                for seg in self.searcher.segments:
                    info = seg.lookup(term)
                    if info is None:
                        continue
                    docids, tfs = seg.decoded(info)
                    starts, ends = seg.offsets_for(info)
                    first = np.cumsum(tfs.astype(np.int64)) - tfs
                    keys = seg.docmap.take(
                        pa.array(docids.astype(np.int64))
                    ).to_pylist()
                    o_qid.extend([int(qid)] * len(docids))
                    o_doc.extend(int(k) for k in keys)
                    o_s.extend(starts[first].astype(np.int64).tolist())
                    o_e.extend(ends[first].astype(np.int64).tolist())
            return pa.table(
                {
                    "qid": pa.array(o_qid, pa.int32()),
                    "doc_id": pa.array(o_doc, pa.int64()),
                    "start_off": pa.array(o_s, pa.int64()),
                    "end_off": pa.array(o_e, pa.int64()),
                }
            )

    qds = ray.data.from_items(
        [{"qid": q, "query": t} for q, t in HL_QUERIES]
    )
    hits_ds = qds.map_batches(
        _OffsetHits, batch_format="pyarrow", concurrency=actor_pool(cap=4)
    )
    docs_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    joined = hits_ds.join(
        docs_ds, join_type="inner", num_partitions=4, on=("doc_id",)
    )

    def snip(b: pa.Table) -> pa.Table:
        import numpy as np

        s = np.asarray(b.column("start_off"), dtype=np.int64)
        e = np.asarray(b.column("end_off"), dtype=np.int64)
        texts = b.column("text").to_pylist()
        n = np.array([len(t) for t in texts], dtype=np.int64)
        lo = np.maximum(s - CTX, 0)
        hi = np.minimum(e + CTX, n)
        return pa.table(
            {
                "qid": b.column("qid"),
                "doc_id": b.column("doc_id"),
                "start_off": b.column("start_off"),
                "end_off": b.column("end_off"),
                "snippet": pa.array(
                    [t[a:z] for t, a, z in zip(texts, lo, hi)], pa.string()
                ),
            }
        )

    return joined.map_batches(snip, batch_format="pyarrow")


def sql_highlight_offsets() -> str:
    """Same oracle shape as ``sql_highlight_search``: on this corpus the
    tokenizer's first in-doc occurrence offset equals the first
    whitespace-delimited occurrence (every existing oracle already
    equates ``string_split(text, ' ')`` with the analyzer)."""
    return sql_highlight_search()


# -- passage-ranked highlighting (round 5) ----------------------------------

# (qid, term, weight) — multi-term weighted queries; integer weights
# keep passage scores integral and SQL-exact
HLR_QUERIES: List[Tuple[int, str, int]] = [
    (0, "spark", 3),
    (0, "merge", 2),
    (1, "data", 2),
    (1, "vector", 3),
    (1, "window", 1),
    (2, "customer", 2),
    (2, "join", 1),
]
PASSAGE_W = 10  # tokens per passage window


def highlight_ranked(sf_dir: str):
    """Passage-RANKED highlighting — the ``UnifiedHighlighter`` passage
    pipeline (``lucene/highlighter/.../uhighlight/UnifiedHighlighter.java``:
    break text into passages, score each against the query's term
    weights, emit the best) on a defined subset: passages are fixed
    ``PASSAGE_W``-token windows (the ``LengthGoalBreakIterator`` role —
    this corpus has no sentence punctuation), passage score = Σ
    weight(term) × occurrences(term in passage) with integer weights
    (the reference's ``PassageScorer`` BM25/pivot weighting replaced by
    caller-supplied integer weights so the gate can hash-check exact
    scores), best passage = highest score, earliest window on ties.

    → (qid, doc_id, pidx, score, passage) ordered by (qid, doc_id),
    one row per (query, matching doc).

    Ray shape: disjunction match sets through the searcher actor pool →
    ``Dataset.join`` with stored text → one vectorized passage kernel
    (Arrow token split, one bincount per query's term set, lexsort
    argmax — per-row Python only to assemble the winning window's
    text)."""
    import ray.data

    idx = get_or_build_index(sf_dir)
    by_qid: dict = {}
    for q, t, w in HLR_QUERIES:
        by_qid.setdefault(q, []).append((t, w))
    qds = ray.data.from_items(
        [
            {
                "qid": q,
                "query": " ".join(t for t, _ in terms),
                "k": 10**9,
            }
            for q, terms in sorted(by_qid.items())
        ]
    )
    res = search_dataset(idx, qds)

    def hits(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": b.column("qid").cast(pa.int32()),
                "doc_id": b.column("key").cast(pa.int64()),
            }
        )

    hits_ds = res.map_batches(hits, batch_format="pyarrow")
    docs_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    joined = hits_ds.join(
        docs_ds, join_type="inner", num_partitions=4, on=("doc_id",)
    )

    def passages(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        n = len(b)
        if n == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "pidx": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                    "passage": pa.array([], pa.string()),
                }
            )
        qid = np.asarray(b.column("qid"), dtype=np.int64)
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, pattern=" ")
        offs = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.values  # all rows' tokens, row-major
        counts = offs[1:] - offs[:-1]
        # global passage id per token: row's passage base + local//W
        n_pass = (counts + PASSAGE_W - 1) // PASSAGE_W
        pass_base = np.concatenate([[0], np.cumsum(n_pass)])
        local = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], counts
        )
        gpid = np.repeat(pass_base[:-1], counts) + local // PASSAGE_W
        total_pass = int(pass_base[-1])
        # score per global passage: one masked bincount per query term,
        # applied only to that query's rows' token spans
        tok_row = np.repeat(np.arange(n, dtype=np.int64), counts)
        score = np.zeros(total_pass, dtype=np.int64)
        for q, terms in by_qid.items():
            row_mask = qid[tok_row] == q
            for t, w in terms:
                m = (
                    np.asarray(pc.equal(flat, t), dtype=bool)
                    & row_mask
                )
                if m.any():
                    score += w * np.bincount(
                        gpid[m], minlength=total_pass
                    )
        # per row: best passage = (score desc, pidx asc) first
        prow = np.repeat(np.arange(n, dtype=np.int64), n_pass)
        ppidx = np.arange(total_pass, dtype=np.int64) - np.repeat(
            pass_base[:-1], n_pass
        )
        perm = np.lexsort((ppidx, -score, prow))
        firsts = perm[
            np.flatnonzero(np.diff(prow[perm], prepend=-1) != 0)
        ]
        win_pidx = ppidx[firsts]
        win_score = score[firsts]
        # assemble winning windows' text: gather ONLY the winners'
        # tokens (≤ W per row) — never materialize the batch's full
        # token array as Python objects
        win_a = offs[:-1] + win_pidx * PASSAGE_W
        win_z = np.minimum(offs[1:], win_a + PASSAGE_W)
        wlens = win_z - win_a
        gather = np.repeat(win_a, wlens) + (
            np.arange(int(wlens.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(wlens) - wlens, wlens)
        )
        wtoks = flat.take(pa.array(gather)).to_pylist()
        out_passage = []
        pos = 0
        for L in wlens:
            out_passage.append(" ".join(wtoks[pos : pos + int(L)]))
            pos += int(L)
        return pa.table(
            {
                "qid": pa.array(qid, pa.int32()),
                "doc_id": b.column("doc_id"),
                "pidx": pa.array(win_pidx, pa.int64()),
                "score": pa.array(win_score, pa.int64()),
                "passage": pa.array(out_passage, pa.string()),
            }
        )

    return joined.map_batches(passages, batch_format="pyarrow").sort(
        ["qid", "doc_id"]
    )


def sql_highlight_ranked() -> str:
    vals = ", ".join(f"({q}, '{t}', {w})" for q, t, w in HLR_QUERIES)
    return f"""
with q(qid, term, w) as (values {vals}),
toks as (
  select doc_id, string_split(text, ' ') as ts from documents
),
tok as (
  select doc_id, g.i as ord, ts[g.i] as term,
         (g.i - 1) // {PASSAGE_W} as pidx
  from toks, unnest(generate_series(1, len(ts))) as g(i)
),
scores as (
  select q.qid, tok.doc_id, tok.pidx, sum(q.w) as score
  from q join tok on tok.term = q.term
  group by q.qid, tok.doc_id, tok.pidx
),
best as (
  select qid, doc_id, pidx, score,
         row_number() over (
           partition by qid, doc_id order by score desc, pidx asc
         ) as rn
  from scores
),
ptxt as (
  select doc_id, pidx, string_agg(term, ' ' order by ord) as passage
  from tok group by doc_id, pidx
)
select cast(b.qid as int) as qid, b.doc_id as doc_id,
       cast(b.pidx as bigint) as pidx,
       cast(b.score as bigint) as score,
       p.passage
from best b join ptxt p on p.doc_id = b.doc_id and p.pidx = b.pidx
where b.rn = 1
order by qid, b.doc_id
"""


def sql_highlight_search() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in HL_QUERIES)
    return f"""
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
q(qid, term) as (values {vals}),
m as (
  select distinct q.qid, tok.doc_id, q.term
  from q join tok on tok.term = q.term
),
h as (
  select m.qid, m.doc_id,
         instr(' ' || d.text || ' ', ' ' || m.term || ' ') - 1 as s,
         length(m.term) as L, d.text, length(d.text) as n
  from m join documents d using (doc_id)
)
select cast(qid as int) as qid, doc_id,
       cast(s as bigint) as start_off, cast(s + L as bigint) as end_off,
       substring(text, greatest(0, s - {CTX}) + 1,
                 least(n, s + L + {CTX}) - greatest(0, s - {CTX})) as snippet
from h
"""
