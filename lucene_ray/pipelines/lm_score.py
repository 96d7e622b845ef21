"""Language-model perplexity scoring — the CCNet-style quality gate
(Wenzek et al. 2020, arXiv:1911.00359): score every document by its
negative log-likelihood under a corpus language model and keep the
low-perplexity slice. CCNet uses a KenLM 5-gram; this engine ships the
same pipeline shape with a word-unigram model trained on the corpus
itself in one streaming pass (no external model files in this
container), which is the degenerate-order KenLM and exercises the
identical Ray plumbing: combiner partials → tiny ``groupby`` aggregate
→ ``ray.put`` broadcast → vectorized per-batch scoring.

Determinism device (same as ``pipelines/classify.py``): per-term log
probabilities quantize to INTEGER micro-nats ``floor(ln(p)·1e6 + 0.5)``
so each document's NLL is an order-free integer sum — bit-identical in
numpy and DuckDB. Add-one smoothing ``p(w) = (c(w)+1)/(N+V)``.

Keep rule in integer algebra: mean NLL per word ≤ ``KEEP_NATS_MICRO`` micro-nats
⇔ ``nll_micro_nats ≤ KEEP_NATS_MICRO · n_words`` (empty docs drop).
"""

from __future__ import annotations

import os

from lucene_ray.cluster import actor_pool
from typing import Dict

from lucene_ray.pipelines.text_kernels import flat_words, seg_sum

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000  # micro-nats
# keep iff mean NLL/word ≤ 3.405 nats — sits inside the synthetic
# corpus's NLL/word distribution (p50≈3.402, p75≈3.405) so the flag
# actually discriminates AND exercises exact integer tie arithmetic
KEEP_NATS_MICRO = 3_405_000


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")




def lm_train(sf_dir: str):
    """One streaming pass → (vocab dict term→code, lp int64[V] per-term
    micro-nat log p, unseen_lp int64). The shuffle carries per-BATCH
    pre-aggregated (term, cnt) partials; only the vocab-sized aggregate
    reaches the driver."""
    import ray.data

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = flat_words(b.column("text"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "term": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("cnt")
        .to_pandas()
    )  # vocab-sized aggregate only
    cnt_col = [c for c in stats.columns if c.startswith("sum")][0]
    terms = sorted(stats["term"])
    vocab: Dict[str, int] = {t: i for i, t in enumerate(terms)}
    counts = np.zeros(len(terms), dtype=np.int64)
    counts[[vocab[t] for t in stats["term"]]] = stats[cnt_col].to_numpy()
    denom = float(counts.sum() + len(terms))
    lp = np.floor(np.log((counts + 1) / denom) * SCALE + 0.5).astype(np.int64)
    unseen = int(np.floor(np.log(1.0 / denom) * SCALE + 0.5))
    return vocab, lp, unseen


def lm_perplexity(sf_dir: str):
    """→ (doc_id, n_words, nll_micro_nats, keep) sorted by doc_id:
    integer NLL per doc under the corpus unigram LM + the CCNet-style
    low-perplexity keep flag."""
    import ray
    import ray.data

    vocab, lp, unseen = lm_train(sf_dir)
    model = ray.put((vocab, lp, unseen))

    class Score:
        def __init__(self):
            self.vocab, self.lp, self.unseen = ray.get(model)
            # NLL per code: negative lp, with the unseen bucket appended
            self.nll = np.concatenate(
                [-self.lp, [-self.unseen]]
            ).astype(np.int64)
            self.unk = len(self.vocab)

        def __call__(self, b: pa.Table) -> pa.Table:
            import pandas as pd

            flat, offsets = flat_words(b.column("text"))
            ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            n = len(b)
            if len(flat):
                codes = (
                    pd.Series(flat.to_numpy(zero_copy_only=False))
                    .map(self.vocab)
                    .fillna(self.unk)
                    .to_numpy(dtype=np.int64)
                )
                per_tok = self.nll[codes] * ok  # empty splits contribute 0
                nll = seg_sum(per_tok, offsets)
                n_words = seg_sum(ok, offsets)
            else:
                nll = np.zeros(n, dtype=np.int64)
                n_words = np.zeros(n, dtype=np.int64)
            keep = (n_words > 0) & (
                nll <= KEEP_NATS_MICRO * n_words
            )
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "n_words": pa.array(n_words, pa.int64()),
                    "nll_micro_nats": pa.array(nll, pa.int64()),
                    "keep": pa.array(keep),
                }
            )

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text"]
    )
    return ds.map_batches(Score, batch_format="pyarrow", concurrency=actor_pool()).sort(
        "doc_id"
    )


def sql_lm_perplexity() -> str:
    """The identical unigram LM in DuckDB: same add-one smoothing, same
    micro-nat quantization, same integer keep rule."""
    return f"""
with tok as (
  select doc_id, t.term from documents, unnest(string_split(text, ' ')) as t(term)
  where t.term <> ''
),
cnt as (select term, count(*)::bigint as c from tok group by term),
tots as (
  select (select sum(c) from cnt)::bigint as n,
         (select count(*) from cnt)::bigint as v
),
lp as (
  select cnt.term,
         cast(floor(ln((cnt.c + 1) / cast(t.n + t.v as double)) * {SCALE} + 0.5)
              as bigint) as lp
  from cnt, tots t
),
doc as (
  select t.doc_id,
         count(*)::bigint as n_words,
         sum(-l.lp)::bigint as nll
  from tok t join lp l using (term)
  group by t.doc_id
)
select d.doc_id,
       coalesce(doc.n_words, 0) as n_words,
       coalesce(doc.nll, 0) as nll_micro_nats,
       (coalesce(doc.n_words, 0) > 0
        and coalesce(doc.nll, 0) <= {KEEP_NATS_MICRO} * coalesce(doc.n_words, 0)) as keep
from documents d left join doc on doc.doc_id = d.doc_id
order by d.doc_id
"""
