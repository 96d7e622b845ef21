"""Language identification by character-n-gram profiles — the
Cavnar & Trenkle (1994) "N-Gram-Based Text Categorization" family,
with integer profile dot-products instead of rank-order distance so
the result is bit-exact SQL-checkable (the ``nb_classify`` playbook).

Plan shape (100-TB ready):

- **train**: per-batch partial char-trigram counts (vectorized byte
  sliding window — no per-char Python) → one ``groupby(lang, tri)``
  sum whose output is bounded by langs × trigram vocab, → top-``T``
  trigrams per language (cnt desc, tri asc) → profiles broadcast via
  ``ray.put`` (≤ langs × T weights);
- **classify**: per batch, trigram counts × profile weights = one
  sparse integer dot product per language (np.searchsorted against the
  sorted profile keys); argmax with (score desc, lang asc) tie-break.

Only integers flow into scores, so the DuckDB oracle (substr-based
trigram extraction + the same windowed top-T + the same dot product)
matches hash-exactly.  Trigram identity is a 21-bit-per-codepoint pack
(injective + order-preserving vs UTF-8 binary collation), so parity
holds for any Unicode corpus; non-ASCII batches take a vectorized
UTF-32 view of the same kernel.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

TOP_T = 200  # profile size per language


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _trigram_codes(texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """→ (codes int64, doc_of int64) for every char trigram of every
    text. Vectorized over the whole batch: one codepoint buffer, one
    sliding window, separator windows masked out.

    ``code = cp0<<42 | cp1<<21 | cp2`` — Unicode codepoints fit in 21
    bits, so the pack is injective over codepoint triples AND
    order-preserving (numeric code order == codepoint order == DuckDB's
    UTF-8 binary string collation), giving exact SQL ``substr`` parity
    for ANY corpus, not just ASCII."""
    if not texts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    joined = "\x00".join(texts)
    if joined.isascii():
        b = np.frombuffer(joined.encode(), dtype=np.uint8).astype(np.int64)
    else:
        b = np.frombuffer(
            joined.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
    if len(b) < 3:
        w = np.empty((0, 3), np.int64)
    else:
        w = np.lib.stride_tricks.sliding_window_view(b, 3)
    ok = (w != 0).all(axis=1)
    codes = (w[:, 0] << 42 | w[:, 1] << 21 | w[:, 2])[ok]
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    n_tri = np.maximum(lens - 2, 0)
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), n_tri)
    return codes, doc_of


def _train_profiles(sf_dir: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """lang → (sorted trigram codes, weights): the top-T profile."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text", "lang"])

    def partials(b: pa.Table) -> pa.Table:
        langs = b.column("lang").to_pylist()
        codes, doc_of = _trigram_codes(b.column("text").to_pylist())
        lang_codes, lang_idx = np.unique(np.asarray(langs), return_inverse=True)
        # codes use 63 bits → can't pack (lang, code) into one int64;
        # one np.unique per language present in the batch (≤ #langs).
        tri_lang = lang_idx[doc_of] if len(doc_of) else doc_of
        out_lang: List[np.ndarray] = []
        out_tri: List[np.ndarray] = []
        out_cnt: List[np.ndarray] = []
        for li, lang in enumerate(lang_codes):
            uk, cnt = np.unique(codes[tri_lang == li], return_counts=True)
            out_lang.append(np.full(len(uk), lang, dtype=object))
            out_tri.append(uk)
            out_cnt.append(cnt.astype(np.int64))
        return pa.table(
            {
                "lang": pa.array(
                    np.concatenate(out_lang) if out_lang else [],
                    pa.string(),
                ),
                "tri": pa.array(
                    np.concatenate(out_tri)
                    if out_tri
                    else np.empty(0, np.int64)
                ),
                "cnt": pa.array(
                    np.concatenate(out_cnt)
                    if out_cnt
                    else np.empty(0, np.int64)
                ),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "tri"])
        .aggregate(Sum("cnt", alias_name="total"))
        .to_pandas()  # bounded: langs × trigram vocab
    )
    profiles: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for lang, g in agg.groupby("lang"):
        g = g.sort_values(
            ["total", "tri"], ascending=[False, True]
        ).head(TOP_T)
        order = np.argsort(g["tri"].values)
        profiles[lang] = (
            g["tri"].values[order].astype(np.int64),
            g["total"].values[order].astype(np.int64),
        )
    return profiles


def lang_id(sf_dir: str):
    """→ (doc_id, lang_pred, score) ordered by doc_id: language with
    the max integer trigram-profile dot product (ties → smaller lang)."""
    import ray
    import ray.data

    profiles = _train_profiles(sf_dir)
    langs = sorted(profiles)
    prof_ref = ray.put(profiles)

    def classify(b: pa.Table) -> pa.Table:
        prof = ray.get(prof_ref)
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        codes, doc_of = _trigram_codes(b.column("text").to_pylist())
        n = len(ids)
        scores = np.zeros((n, len(langs)), dtype=np.int64)
        if len(codes):
            ci = codes.astype(np.int64)
            for li, lang in enumerate(langs):
                keys, w = prof[lang]
                pos = np.searchsorted(keys, ci)
                pos_c = np.minimum(pos, len(keys) - 1)
                hit = keys[pos_c] == ci
                contrib = np.where(hit, w[pos_c], 0)
                np.add.at(scores[:, li], doc_of, contrib)
        best = np.argmax(scores, axis=1)  # first max = smallest lang
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang_pred": pa.array([langs[i] for i in best]),
                "score": pa.array(scores[np.arange(n), best], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text"]
    )
    return ds.map_batches(classify, batch_format="pyarrow").sort("doc_id")


def sql_lang_id() -> str:
    return f"""
with tri as (
  select d.lang, substr(d.text, i, 3) as t, count(*) as cnt
  from documents d, unnest(range(1, greatest(len(d.text) - 1, 1))) as r(i)
  group by 1, 2
),
prof as (
  select lang, t, cnt,
         row_number() over (
           partition by lang order by cnt desc, t asc
         ) as rk
  from tri
),
topt as (select lang, t, cnt from prof where rk <= {TOP_T}),
dtri as (
  select d.doc_id, substr(d.text, i, 3) as t, count(*) as dcnt
  from documents d, unnest(range(1, greatest(len(d.text) - 1, 1))) as r(i)
  group by 1, 2
),
scores as (
  -- base = every (doc, lang) pair, so trigram-less docs still score 0
  select dd.doc_id, l.lang,
         coalesce(sum(x.dcnt * p.cnt), 0) as score
  from (select distinct doc_id from documents) dd
  cross join (select distinct lang from documents) l
  left join dtri x on x.doc_id = dd.doc_id
  left join topt p on p.lang = l.lang and p.t = x.t
  group by 1, 2
),
ranked as (
  select doc_id, lang, score,
         row_number() over (
           partition by doc_id order by score desc, lang asc
         ) as rk
  from scores
)
select r.doc_id, r.lang as lang_pred, cast(r.score as bigint) as score
from ranked r
where r.rk = 1
order by r.doc_id
"""
