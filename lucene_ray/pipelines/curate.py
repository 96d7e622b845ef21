"""Composed corpus-curation funnel — the end-to-end shape a web-scale
training-data pipeline actually runs (RefinedWeb / CCNet style), built
entirely from this repo's first-class stages:

1. **Quality gate** — Gopher rules (Rae et al. 2021 §A1.1), the exact
   integer algebra of ``corpus_ops.gopher_quality``, fused into the
   first map so failing docs never leave the read stage.
2. **Eval-slice carve-out** — the md5 selector of
   ``corpus_ops.sample_hash`` removes held-out docs from the train side.
3. **Near-dup removal** — non-canonical members of the MinHash+LSH
   connected components (``dedup.dedup_components`` keep-set).
4. **Decontamination** — docs sharing a word 8-gram with the eval slice
   (``corpus_ops.decontaminate``).

Composition stays streaming: the three drop-sets and the surviving base
rows are tagged rows in ONE union, co-located per doc-id hash bucket by
a single ``groupby``, and resolved with one vectorized ``isin`` per
bucket — the doc-id semi-join never touches the driver and nothing is
broadcast. Reference pipeline shape: the fork's multi-stage ingestion
(analysis chain → updateDocument dedup → index), re-expressed over
Ray Data; stage semantics cite their own modules.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_ray.pipelines.corpus_ops import (
    _GOPHER_STOPS,
    _docs_path,
    decontaminate,
)
from lucene_ray.pipelines.dedup import dedup_components
from lucene_ray.pipelines.text_kernels import flat_words, seg_sum


def curate_corpus(
    sf_dir: str,
    pct: int = 5,
    n: int = 8,
    n_buckets: int = 64,
    keep_text: bool = False,
):
    """→ (doc_id, lang, n_chars[, text]) of the documents that survive
    the full funnel (quality ∧ train-slice ∧ dedup-canonical ∧
    uncontaminated), ordered by doc_id. ``keep_text`` carries the
    document body through for export sinks."""
    import hashlib

    import pandas as pd
    import ray.data

    def _bucketed(ids: np.ndarray) -> pa.Array:
        return pa.array(
            (pd.util.hash_array(ids.astype(np.int64)) % n_buckets).astype(
                np.int32
            )
        )

    def base_rows(b: pa.Table) -> pa.Table:
        flat, offsets = flat_words(b.column("text"))
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        )
        stop = pc.is_in(flat, value_set=pa.array(_GOPHER_STOPS)).to_numpy(
            zero_copy_only=False
        )
        n_words = seg_sum(ok, offsets)
        n_wchars = seg_sum(wl * ok, offsets)
        n_stop = seg_sum(stop & ok, offsets)
        n_alpha = seg_sum(alpha & ok, offsets)
        quality = (
            (n_words >= 50)
            & (n_words <= 100000)
            & (3 * n_words <= n_wchars)
            & (n_wchars <= 10 * n_words)
            & (n_stop >= 2)
            & (5 * n_alpha >= 4 * n_words)
        )
        ids = b.column("doc_id").to_pylist()
        train = np.array(
            [
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[:8], "big"
                )
                % 100
                >= pct
                for i in ids
            ],
            dtype=bool,
        )
        keep = pa.array(quality & train)
        sub = b.filter(keep)
        ids_np = np.asarray(sub.column("doc_id"), dtype=np.int64)
        cols = {
            "bucket": _bucketed(ids_np),
            "doc_id": sub.column("doc_id"),
            "lang": sub.column("lang"),
            "n_chars": sub.column("n_chars"),
            "kind": pa.array(np.zeros(len(sub), np.int32)),
        }
        if keep_text:
            cols["text"] = sub.column("text")
        return pa.table(cols)

    def as_drop(t: pa.Table) -> pa.Table:
        ids_np = np.asarray(t.column("doc_id"), dtype=np.int64)
        m = len(t)
        cols = {
            "bucket": _bucketed(ids_np),
            "doc_id": t.column("doc_id"),
            "lang": pa.array([""] * m, pa.string()),
            "n_chars": pa.array(np.zeros(m, np.int64)),
            "kind": pa.array(np.ones(m, np.int32)),
        }
        if keep_text:
            cols["text"] = pa.array([""] * m, pa.string())
        return pa.table(cols)

    def dup_drops(t: pa.Table) -> pa.Table:
        return as_drop(t.filter(pc.equal(t.column("keep"), 0)))

    def resolve(g: pa.Table) -> pa.Table:
        kind = np.asarray(g.column("kind"))
        did = np.asarray(g.column("doc_id"), dtype=np.int64)
        base = kind == 0
        dropped = np.isin(did[base], did[~base])
        out = g.filter(pa.array(base)).filter(pa.array(~dropped))
        keep_cols = ["doc_id", "lang", "n_chars"] + (
            ["text"] if keep_text else []
        )
        return out.select(keep_cols)

    docs = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "lang", "n_chars"]
    )
    base = docs.map_batches(base_rows, batch_format="pyarrow")
    dups = dedup_components(sf_dir).map_batches(
        dup_drops, batch_format="pyarrow"
    )
    cont = decontaminate(sf_dir, n=n, pct=pct, n_buckets=n_buckets)

    def cont_drops(t: pa.Table) -> pa.Table:
        return as_drop(t)

    cont = cont.map_batches(cont_drops, batch_format="pyarrow")
    return (
        base.union(dups)
        .union(cont)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
        .sort("doc_id")  # oracle-only: determinism for the gate, not a production step
    )


def sql_curate_corpus(pct: int = 5, n: int = 8) -> str:
    from lucene_ray.pipelines.corpus_ops import (
        sql_decontaminate,
        sql_gopher_quality,
    )
    from lucene_ray.pipelines.dedup import sql_dedup_components

    sel = "('0x' || substr(md5(cast(doc_id as varchar)), 1, 16))::UBIGINT % 100"
    return f"""
with qual as (
  select doc_id from ({sql_gopher_quality()}) where keep
),
dropdup as (
  select doc_id from ({sql_dedup_components()}) where keep = 0
),
cont as (
  select doc_id from ({sql_decontaminate(n=n, pct=pct)})
)
select d.doc_id, d.lang, d.n_chars
from documents d
join qual using (doc_id)
where {sel} >= {pct}
  and d.doc_id not in (select doc_id from dropdup)
  and d.doc_id not in (select doc_id from cont)
order by d.doc_id
"""


def export_curated(
    sf_dir: str, out_dir: str, pct: int = 5, n: int = 8, n_buckets: int = 64
) -> int:
    """Run the curation funnel with document text and stream the
    surviving corpus to ``out_dir`` as lang-partitioned Parquet
    (``lang=<l>/...``) — the training-mix layout a downstream tokenizer
    job reads per-language. Returns the number of exported docs. The
    write is the pipeline's consumer: nothing materializes on the
    driver."""
    ds = curate_corpus(
        sf_dir, pct=pct, n=n, n_buckets=n_buckets, keep_text=True
    )
    ds.write_parquet(out_dir, partition_cols=["lang"])
    import ray.data

    return ray.data.read_parquet(out_dir).count()


def curation_report(
    sf_dir: str, pct: int = 5, n: int = 8, n_buckets: int = 64
):
    """→ (source, n_docs, n_quality_train, n_final) per source — the
    per-provenance funnel dashboard a 100 TB curation run is monitored
    by (how much of each crawl/feed survives each gate). Same tagged-
    union + doc-id-bucket resolve as ``curate_corpus``, but base rows
    carry ALL docs with stage flags and the output is a source-bounded
    aggregate (one row per provenance ever reaches the driver)."""
    import hashlib

    import pandas as pd
    import ray.data

    def _bucketed(ids: np.ndarray) -> pa.Array:
        return pa.array(
            (pd.util.hash_array(ids.astype(np.int64)) % n_buckets).astype(
                np.int32
            )
        )

    def base_rows(b: pa.Table) -> pa.Table:
        flat, offsets = flat_words(b.column("text"))
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        )
        stop = pc.is_in(flat, value_set=pa.array(_GOPHER_STOPS)).to_numpy(
            zero_copy_only=False
        )
        n_words = seg_sum(ok, offsets)
        n_wchars = seg_sum(wl * ok, offsets)
        quality = (
            (n_words >= 50)
            & (n_words <= 100000)
            & (3 * n_words <= n_wchars)
            & (n_wchars <= 10 * n_words)
            & (seg_sum(stop & ok, offsets) >= 2)
            & (5 * seg_sum(alpha & ok, offsets) >= 4 * n_words)
        )
        ids = b.column("doc_id").to_pylist()
        train = np.array(
            [
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[:8], "big"
                )
                % 100
                >= pct
                for i in ids
            ],
            dtype=bool,
        )
        ids_np = np.asarray(b.column("doc_id"), dtype=np.int64)
        return pa.table(
            {
                "bucket": _bucketed(ids_np),
                "doc_id": b.column("doc_id"),
                "source": b.column("source"),
                "q_train": pa.array(quality & train),
                "kind": pa.array(np.zeros(len(b), np.int32)),
            }
        )

    def as_drop(t: pa.Table) -> pa.Table:
        ids_np = np.asarray(t.column("doc_id"), dtype=np.int64)
        m = len(t)
        return pa.table(
            {
                "bucket": _bucketed(ids_np),
                "doc_id": t.column("doc_id"),
                "source": pa.array([""] * m, pa.string()),
                "q_train": pa.array(np.zeros(m, bool)),
                "kind": pa.array(np.ones(m, np.int32)),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        kind = np.asarray(g.column("kind"))
        did = np.asarray(g.column("doc_id"), dtype=np.int64)
        base = kind == 0
        sub = g.filter(pa.array(base))
        q_train = np.asarray(sub.column("q_train"))
        dropped = np.isin(did[base], did[~base])
        final = q_train & ~dropped
        # pre-aggregate per source inside the bucket task
        src = sub.column("source").to_numpy(zero_copy_only=False)
        u, inv = np.unique(src, return_inverse=True)
        nd = np.bincount(inv, minlength=len(u)).astype(np.int64)
        nq = np.bincount(inv, weights=q_train, minlength=len(u)).astype(
            np.int64
        )
        nf = np.bincount(inv, weights=final, minlength=len(u)).astype(
            np.int64
        )
        return pa.table(
            {
                "source": pa.array(u, pa.string()),
                "n_docs": pa.array(nd),
                "n_quality_train": pa.array(nq),
                "n_final": pa.array(nf),
            }
        )

    docs = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "source"]
    )
    base = docs.map_batches(base_rows, batch_format="pyarrow")
    dups = dedup_components(sf_dir).map_batches(
        lambda t: as_drop(t.filter(pc.equal(t.column("keep"), 0))),
        batch_format="pyarrow",
    )
    cont = decontaminate(sf_dir, n=n, pct=pct, n_buckets=n_buckets).map_batches(
        as_drop, batch_format="pyarrow"
    )
    return (
        base.union(dups)
        .union(cont)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_docs", "n_quality_train", "n_final"])
        .map_batches(
            lambda t: t.rename_columns(
                ["source", "n_docs", "n_quality_train", "n_final"]
            ),
            batch_format="pyarrow",
        )
        .sort("source")
    )


def sql_curation_report(pct: int = 5, n: int = 8) -> str:
    from lucene_ray.pipelines.corpus_ops import (
        sql_decontaminate,
        sql_gopher_quality,
    )
    from lucene_ray.pipelines.dedup import sql_dedup_components

    sel = "('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 16))::UBIGINT % 100"
    return f"""
with qual as (
  select doc_id from ({sql_gopher_quality()}) where keep
),
dropdup as (
  select doc_id from ({sql_dedup_components()}) where keep = 0
),
cont as (
  select doc_id from ({sql_decontaminate(n=n, pct=pct)})
),
flags as (
  select d.source,
         (d.doc_id in (select doc_id from qual) and {sel} >= {pct}) as qt,
         (d.doc_id in (select doc_id from qual) and {sel} >= {pct}
          and d.doc_id not in (select doc_id from dropdup)
          and d.doc_id not in (select doc_id from cont)) as fin
  from documents d
)
select source,
       count(*)::bigint as n_docs,
       sum(case when qt then 1 else 0 end)::bigint as n_quality_train,
       sum(case when fin then 1 else 0 end)::bigint as n_final
from flags
group by source
order by source
"""
