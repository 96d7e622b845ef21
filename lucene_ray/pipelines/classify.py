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


# --------------------------------------------------------------------------
# k-nearest-neighbor classification — the ``lucene/classification``
# ``KNearestNeighborClassifier.java`` role (classify by majority vote of
# the k most similar neighbors). The reference's neighbors come from an
# MLT query over the index; this engine's come from exact cosine over
# the embedding column — the KnnVector-era form of the same classifier.
# --------------------------------------------------------------------------

KNN_CLS_K = 5


def knn_classify(sf_dir: str, k: int = KNN_CLS_K, block_rows: int = 2048):
    """→ (vec_id, label_pred, votes) sorted by vec_id: per vector, the
    majority label of its k nearest OTHER vectors by cosine; neighbor
    set pinned by (sim_bp desc, cand_id asc), vote ties by
    (votes desc, label asc) — all integer, hash-exact vs the oracle.

    Plan (nothing materializes the full matrix): normalize + pack
    ``block_rows``-sized blocks to scratch (atomic, reusable), one Ray
    task per ORDERED block pair emits ≤ block_rows·k partial-top-k rows
    (composite ``(bp<<40) − cand`` keys make the per-row cut one
    argpartition, no Python row loop), then a ``groupby(vec_id)``
    reduce takes the global top-k and votes."""
    import hashlib as _hl
    import tempfile

    import ray
    import ray.data
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = pq.ParquetFile(path).metadata.num_rows  # footer only
    n_blocks = max(1, -(-n_rows // block_rows))
    scratch = os.path.join(
        tempfile.gettempdir(),
        "lucene_ray_knncls",
        _hl.blake2b(
            f"{os.path.abspath(path)}:{n_rows}:{n_blocks}".encode(),
            digest_size=8,
        ).hexdigest(),
    )
    os.makedirs(scratch, exist_ok=True)

    def normalize(b: pa.Table) -> pa.Table:
        arr = b.column("embedding").combine_chunks()
        emb = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
        n = np.linalg.norm(emb, axis=1, keepdims=True)
        n[n == 0] = 1.0
        emb = emb / n
        vec_ids = np.asarray(b.column("vec_id"), dtype=np.int64)
        return pa.table(
            {
                "blk": pa.array((vec_ids % n_blocks).astype(np.int64)),
                "vec_id": pa.array(vec_ids),
                "label": b.column("label").cast(pa.int32()),
                "emb": pa.array(list(emb), pa.list_(pa.float64())),
            }
        )

    def pack_block(group: pa.Table):
        blk = int(group.column("blk")[0].as_py())
        out = os.path.join(scratch, f"blk_{blk:06d}.npz")
        if not os.path.exists(out):
            ids = np.asarray(group.column("vec_id"), dtype=np.int64)
            order = np.argsort(ids)
            arr = group.column("emb").combine_chunks()
            mat = np.asarray(arr.values, dtype=np.float64).reshape(
                len(arr), -1
            )[order]
            labels = np.asarray(group.column("label"), dtype=np.int32)[order]
            tmp = out + f".tmp{os.getpid()}.npz"
            with open(tmp, "wb") as f:
                np.savez(f, ids=ids[order], mat=mat, labels=labels)
            os.replace(tmp, out)
        return pa.table(
            {
                "blk": group.column("blk").slice(0, 1),
                "path": pa.array([out], pa.string()),
            }
        )

    ds = ray.data.read_parquet(
        path, columns=["vec_id", "embedding", "label"]
    )
    block_meta = (
        ds.map_batches(normalize, batch_format="pyarrow")
        .groupby("blk")
        .map_groups(pack_block, batch_format="pyarrow")
        .take_all()
    )  # B metadata rows (paths) only
    paths = {int(r["blk"]): r["path"] for r in block_meta}
    pair_items = [
        {"i": i, "j": j, "pi": paths[i], "pj": paths[j]}
        for i in sorted(paths)
        for j in sorted(paths)
    ]

    def _load(p):
        with np.load(p) as z:
            return z["ids"], z["mat"], z["labels"]

    def score_pair(batch: pa.Table) -> pa.Table:
        oq, oc, ol, ob = [], [], [], []
        for i, j, pi, pj in zip(
            batch.column("i").to_pylist(),
            batch.column("j").to_pylist(),
            batch.column("pi").to_pylist(),
            batch.column("pj").to_pylist(),
        ):
            ids_i, mat_i, _ = _load(pi)
            ids_j, mat_j, lab_j = _load(pj)
            sims = mat_i @ mat_j.T
            bp = np.floor(sims * 10000 + 0.5).astype(np.int64)
            # composite key: (bp desc, cand_id asc) in ONE argpartition;
            # |bp| ≤ ~10001 so bp<<40 never overflows and the - cand
            # term (ids < 2^40) never crosses a bp level
            key = (bp << 40) - ids_j[None, :]
            # on the diagonal pair each row contains exactly one SELF
            # column — take one extra slot, then drop self by id equality
            # (cosines may legitimately be negative, so no bp sentinel)
            kk = min(k + (1 if i == j else 0), key.shape[1])
            sel = np.argpartition(-key, kth=kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(ids_i)), kk)
            cols = sel.ravel()
            keep = (
                ids_i[rows] != ids_j[cols]
                if i == j
                else np.ones(len(rows), dtype=bool)
            )
            oq.append(np.repeat(ids_i, kk)[keep])
            oc.append(ids_j[cols][keep])
            ol.append(lab_j[cols][keep])
            ob.append(bp[rows, cols][keep])
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(oq), pa.int64()),
                "cand": pa.array(np.concatenate(oc), pa.int64()),
                "label": pa.array(np.concatenate(ol), pa.int32()),
                "bp": pa.array(np.concatenate(ob), pa.int64()),
            }
        )

    def vote(group: pa.Table) -> pa.Table:
        vid = group.column("vec_id")[0]
        cand = np.asarray(group.column("cand"), dtype=np.int64)
        lab = np.asarray(group.column("label"), dtype=np.int32)
        bp = np.asarray(group.column("bp"), dtype=np.int64)
        order = np.lexsort((cand, -bp))[:k]
        labs, counts = np.unique(lab[order], return_counts=True)
        win = np.lexsort((labs, -counts))[0]
        return pa.table(
            {
                "vec_id": pa.array([vid.as_py()], pa.int64()),
                "label_pred": pa.array([int(labs[win])], pa.int32()),
                "votes": pa.array([int(counts[win])], pa.int64()),
            }
        )

    pairs_ds = ray.data.from_items(pair_items)
    if len(pair_items) > 1:
        pairs_ds = pairs_ds.repartition(len(pair_items))
    partials = pairs_ds.map_batches(score_pair, batch_format="pyarrow")
    return (
        partials.groupby("vec_id")
        .map_groups(vote, batch_format="pyarrow")
        .sort("vec_id")
    )


def sql_knn_classify(k: int = KNN_CLS_K) -> str:
    """Same neighbor pinning and vote tie-breaks in DuckDB; cosine in
    basis points via the proven floor(x·1e4 + 0.5) parity."""
    return f"""
with sims as (
  select a.vec_id as q, b.vec_id as c, b.label,
         cast(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5)
              as bigint) as bp
  from embeddings a join embeddings b on a.vec_id <> b.vec_id
),
ranked as (
  select q, c, label, bp,
         row_number() over (partition by q order by bp desc, c asc) as rn
  from sims
),
votes as (
  select q, label, count(*)::bigint as v
  from ranked where rn <= {k} group by q, label
),
best as (
  select q, label, v,
         row_number() over (partition by q order by v desc, label asc) as rn
  from votes
)
select q as vec_id, cast(label as int) as label_pred, v as votes
from best where rn = 1
order by vec_id
"""
