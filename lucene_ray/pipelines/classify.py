"""Naive Bayes text classification — the ``lucene/classification``
module's role (``classification/src/java/org/apache/lucene/
classification/SimpleNaiveBayesClassifier.java``: classify text into the
values of a class field using corpus statistics; the reference reads
them from an index, this engine aggregates them in one Ray pass).

Plan (two stages, both streaming):

1. **Train** — ``map_batches`` emits per-batch pre-aggregated
   (lang, term, cnt) partials (the combiner that keeps the shuffle
   small), a ``groupby(lang, term)`` sums them, and the resulting class
   stats — vocab × n_classes log-probabilities, a few hundred KB — come
   to the driver and broadcast via ``ray.put``. The big table never
   materializes; only the aggregate does (same shape as
   ``collection_stats``).
2. **Classify** — an actor pool maps each batch's tokens to vocabulary
   codes and scores every class with ONE ``counts @ logprob`` integer
   matmul per batch.

Determinism device (and what makes the DuckDB oracle exact): per-
(term, class) log-probabilities quantize to integer micro-nats,
``floor(ln(p) * 1e6 + 0.5)``, so scores are INTEGER sums — order-free,
identical in numpy and SQL (a float log-prob sum's last ulp would
depend on summation order and could flip an argmax on a near-tie).
Multinomial NB with add-one smoothing: ``p(w|c) = (cnt + 1) /
(tot_c + V)``, prior ``dc_c / n_docs``; ties break by ascending class
name on both sides.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

SCALE = 1_000_000  # micro-nats


def _lp(x: float) -> int:
    return int(np.floor(np.log(x) * SCALE + 0.5))


def nb_train(sf_dir: str):
    """→ (classes sorted asc, vocab dict term→code, lp_matrix
    int64[V+1, C] — last row = unseen-term smoothing, prior_lp
    int64[C])."""
    import ray.data

    def partial(b: pa.Table) -> pa.Table:
        langs = b.column("lang").to_pylist()
        texts = b.column("text").to_pylist()
        agg: Dict[Tuple[str, str], int] = {}
        for lang, t in zip(langs, texts):
            for w in (t or "").split():
                k = (lang, w)
                agg[k] = agg.get(k, 0) + 1
        if not agg:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        ks = sorted(agg)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks]),
                "term": pa.array([k[1] for k in ks]),
                "cnt": pa.array([agg[k] for k in ks], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )
    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .sum("cnt")
        .to_pandas()
    )  # vocab × classes aggregate only — tiny
    cnt_col = [c for c in stats.columns if c.startswith("sum")][0]
    classes = sorted(stats["lang"].unique())
    vocab = {t: i for i, t in enumerate(sorted(stats["term"].unique()))}
    V, C = len(vocab), len(classes)
    counts = np.zeros((V, C), dtype=np.int64)
    ci = {c: i for i, c in enumerate(classes)}
    counts[
        [vocab[t] for t in stats["term"]],
        [ci[l] for l in stats["lang"]],
    ] = stats[cnt_col].to_numpy()
    tot = counts.sum(axis=0)  # tokens per class
    # doc counts per class for the prior
    import pyarrow.parquet as pq

    langs = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
        )
        .column("lang")
        .to_pylist()
    )
    n_docs = len(langs)
    dc = np.array([langs.count(c) for c in classes], dtype=np.int64)
    lp = np.empty((V + 1, C), dtype=np.int64)
    for c in range(C):
        denom = float(tot[c] + V)
        lp[:V, c] = np.floor(
            np.log((counts[:, c] + 1) / denom) * SCALE + 0.5
        ).astype(np.int64)
        lp[V, c] = _lp(1.0 / denom)  # unseen term
    prior_lp = np.array(
        [_lp(dc[c] / float(n_docs)) for c in range(C)], dtype=np.int64
    )
    return classes, vocab, lp, prior_lp


def nb_classify(sf_dir: str):
    """→ (doc_id, lang_pred, score_bp): argmax class per document under
    the trained model (score_bp = integer micro-nat log posterior of the
    winning class)."""
    import ray
    import ray.data

    classes, vocab, lp, prior_lp = nb_train(sf_dir)
    model = ray.put((classes, vocab, lp, prior_lp))

    class Score:
        def __init__(self):
            self.classes, self.vocab, self.lp, self.prior = ray.get(model)
            self.unk = len(self.vocab)

        def __call__(self, b: pa.Table) -> pa.Table:
            import pandas as pd

            texts = b.column("text").to_pylist()
            n = len(texts)
            toks_per_doc = [(t or "").split() for t in texts]
            lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
            scores = np.tile(self.prior, (n, 1))
            if lens.sum():
                flat = np.concatenate(
                    [t for t in toks_per_doc if t]
                ).astype(object)
                # vectorized vocabulary lookup (C path, no per-token loop)
                codes = (
                    pd.Series(flat)
                    .map(self.vocab)
                    .fillna(self.unk)
                    .to_numpy(dtype=np.int64)
                )
                starts = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(lens, out=starts[1:])
                sums = np.add.reduceat(
                    self.lp[codes],
                    np.minimum(starts[:-1], len(codes) - 1),
                    axis=0,
                )
                # reduceat on an empty doc repeats the next doc's slice —
                # mask those rows to zero
                sums[lens == 0] = 0
                scores += sums
            # np.argmax takes the FIRST maximum → ascending class name
            best = np.argmax(scores, axis=1)
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "lang_pred": pa.array(
                        [self.classes[c] for c in best], pa.string()
                    ),
                    "score_bp": pa.array(
                        scores[np.arange(n), best], pa.int64()
                    ),
                }
            )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    return ds.map_batches(Score, batch_format="pyarrow", concurrency=2).sort(
        "doc_id"
    )


def sql_nb_classify() -> str:
    """The identical model in DuckDB: same add-one smoothing, same
    integer micro-nat quantization, same (score desc, lang asc)
    tie-break."""
    return f"""
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
cls as (select lang, count(*)::bigint as dc from documents group by lang),
n as (select count(*)::bigint as nd from documents),
cstat as (
  select d.lang, t.term, count(*)::bigint as cnt
  from tok t join documents d using (doc_id) group by 1, 2
),
ctot as (select lang, sum(cnt)::bigint as tot from cstat group by lang),
vocab as (select count(distinct term)::bigint as v from tok),
lp as (
  select c.lang, w.term,
         cast(floor(ln((coalesce(s.cnt, 0) + 1)
                       / cast(ct.tot + vv.v as double)) * {SCALE} + 0.5)
              as bigint) as lp
  from (select distinct term from tok) w
  cross join (select lang from cls) c
  left join cstat s on s.lang = c.lang and s.term = w.term
  join ctot ct on ct.lang = c.lang
  cross join vocab vv
),
prior as (
  select cls.lang,
         cast(floor(ln(cls.dc / cast(n.nd as double)) * {SCALE} + 0.5)
              as bigint) as plp
  from cls, n
),
docscore as (
  select d.doc_id, p.lang,
         p.plp + coalesce(sum(l.lp), 0) as score
  from documents d
  cross join prior p
  left join tok t on t.doc_id = d.doc_id
  left join lp l on l.lang = p.lang and l.term = t.term
  group by 1, 2, p.plp
),
ranked as (
  select doc_id, lang, score,
         row_number() over (
           partition by doc_id order by score desc, lang asc) as rn
  from docscore
)
select doc_id, lang as lang_pred, score as score_bp
from ranked where rn = 1
order by doc_id
"""
