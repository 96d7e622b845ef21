"""Groupby-term shuffle index build with explicit head-term salting — the
north-star construction: analysis via ``map_batches`` over Arrow batches,
then a ``groupby((bucket, salt))`` shuffle constructs sorted posting
lists, with Zipf head terms split by docid range (salt) and re-concatenated
in docid order by a follow-up stage (SURVEY §4 "skew" row, §7.2.3).

Pipeline (one logical segment spanning the whole input, ``num_buckets``
term-hash parts):

  stage A (map, per partition):  read rows → tokenize/invert (vectorized)
      → emit pre-aggregated partial postings rows ``(bucket, salt, term,
      docids[], tfs[])`` with GLOBAL docids (bases from parquet footers);
      per-doc norms/docmap pieces written directly (no shuffle needed —
      they are docid-partitioned already).
  stage B (shuffle): ``groupby(bucket, salt).map_groups`` — merge each
      term's partial runs in docid order, delta+FOR/PFor encode, write the
      bucket's postings part. Hot terms (df over ``hot_term_df_ratio``,
      estimated from a deterministic sample) are salted: each salt sees
      only a contiguous partition range, so salt order == docid order.
  stage C (concat): per bucket, gather the hot-term raw runs from every
      salt, concatenate in salt order (docid-sorted by construction),
      encode once, and fold into the bucket's term table — the "ordered
      concat of salted runs" the survey calls out (§7.3.5).

Differences from the segmented build (``index.build``): postings only
(``positions`` must be False — phrase queries need the segmented build);
resume granularity is the whole run, not per partition. Both builds emit
byte-compatible segments; ``tests/test_shuffle_build.py`` asserts
search-result equality.

At 10^12-doc scale each stage streams: stage A output is pre-aggregated
per (partition, term) so the shuffle moves one row per term per partition,
not one per token; bucket count B spreads shuffle fan-in; salting bounds
the largest single group at ``hot_term_postings / num_salts``.
"""

from __future__ import annotations

import json
import os
import time
import zlib
from typing import Dict, FrozenSet, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.codecs.postings import encode_postings
from lucene_ray.codecs.smallfloat import encode_norms
from lucene_ray.index.build import plan_partitions, read_partition
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import Manifest, commit_manifest, segment_dir
from lucene_ray.index.segment import invert_texts


def detect_hot_terms(
    paths: List[str], config: IndexConfig, sample_rows: int = 4096
) -> FrozenSet[str]:
    """Deterministic sample pass: df over the first ``sample_rows`` rows of
    the sorted file list; Zipf heads are stable under sampling (SURVEY
    §7.2.3.b piggybacked counts, simplified to a prefix sample)."""
    first = sorted(paths)[0]
    tbl = read_partition(first, 0, min(sample_rows, pq.ParquetFile(first).metadata.num_rows),
                         [config.text_col])
    analyzer = Analyzer(stopwords=config.stopwords,
                        max_token_length=config.max_token_length)
    from collections import Counter

    df = Counter()
    n = 0
    for text in tbl.column(config.text_col).to_pylist():
        n += 1
        terms, _ = analyzer.analyze_fast(text or "")
        df.update(set(terms))
    if n == 0:
        return frozenset()
    thresh = config.hot_term_df_ratio * n
    return frozenset(t for t, c in df.items() if c >= thresh)


def _analyze_partition(item: dict, config: IndexConfig, seg_dir_path: str,
                       hot: FrozenSet[str], n_partitions: int) -> pa.Table:
    """Stage A for one partition → partial postings rows."""
    pid = int(item["seg_id"])
    base = int(item["base_docid"])
    tbl = read_partition(item["path"], int(item["row_start"]), int(item["row_end"]),
                         [config.key_col, config.text_col])
    analyzer = Analyzer(stopwords=config.stopwords,
                        max_token_length=config.max_token_length)
    inv = invert_texts(tbl.column(config.text_col).to_pylist(), analyzer,
                       with_positions=False)
    # norms + docmap pieces (docid-partitioned, no shuffle)
    pieces = os.path.join(seg_dir_path, "pieces")
    os.makedirs(pieces, exist_ok=True)
    norms = encode_norms(inv.doc_lengths)
    with open(os.path.join(pieces, f"norms_{pid:06d}.bin"), "wb") as f:
        f.write(norms.tobytes())
    pq.write_table(
        pa.table({"key": tbl.column(config.key_col)}),
        os.path.join(pieces, f"docmap_{pid:06d}.parquet"),
    )
    meta = {
        "pid": pid, "base": base, "n_docs": len(inv.doc_lengths),
        "doc_count": int((inv.doc_lengths > 0).sum()),
        "sum_ttf": int(inv.doc_lengths.sum()),
    }
    with open(os.path.join(pieces, f"piece_{pid:06d}.json"), "w") as f:
        json.dump(meta, f)

    term_strs = inv.terms.to_pylist()
    salt_span = max(1, -(-n_partitions // config.num_salts))
    my_salt = pid // salt_span
    buckets, salts, terms_o, docids_o, tfs_o = [], [], [], [], []
    for ti, term in enumerate(term_strs):
        s, e = inv.term_starts[ti], inv.term_starts[ti + 1]
        buckets.append(config.term_bucket(term))
        salts.append(my_salt if term in hot else 0)
        terms_o.append(term)
        docids_o.append((inv.pair_docids[s:e].astype(np.int64) + base).tolist())
        tfs_o.append(inv.pair_tfs[s:e].tolist())
    return pa.table(
        {
            "bucket": pa.array(buckets, pa.int32()),
            "salt": pa.array(salts, pa.int32()),
            "term": pa.array(terms_o, pa.large_string()),
            "docids": pa.array(docids_o, pa.list_(pa.int64())),
            "tfs": pa.array(tfs_o, pa.list_(pa.int32())),
        }
    )


def build_index_shuffled(
    paths,
    index_dir: str,
    config: Optional[IndexConfig] = None,
    hot_terms: Optional[FrozenSet[str]] = None,
) -> Manifest:
    """Build a one-segment index via the groupby-term shuffle."""
    import ray
    import ray.data
    from ray.data import DataContext

    config = config or IndexConfig(num_buckets=8, positions=False)
    if config.positions:
        raise ValueError(
            "shuffle build is DOCS_AND_FREQS only; use build_index for positions"
        )
    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = [os.path.join(paths, f) for f in os.listdir(paths)
                     if f.endswith(".parquet")]
        else:
            paths = [paths]
    paths = sorted(paths)
    sdir = segment_dir(index_dir, 0)
    os.makedirs(sdir, exist_ok=True)

    plan = plan_partitions(paths, config.rows_per_segment)
    n_partitions = len(plan)
    hot = hot_terms if hot_terms is not None else detect_hot_terms(paths, config)

    ctx = DataContext.get_current()
    prev_min = ctx.target_min_block_size
    ctx.target_min_block_size = 1
    try:
        work = ray.data.from_items(plan)
        if len(plan) > 1:
            work = work.repartition(len(plan))

        def stage_a(batch: Dict[str, np.ndarray]) -> pa.Table:
            outs = []
            for i in range(len(batch["seg_id"])):
                item = {k: batch[k][i] for k in batch}
                outs.append(
                    _analyze_partition(item, config, sdir, hot, n_partitions)
                )
            return pa.concat_tables(outs)

        partials = work.map_batches(stage_a, batch_format="numpy")

        nb = config.num_buckets

        def assemble(group: pa.Table) -> pa.Table:
            """Stage B: one (bucket, salt) group → encoded part piece."""
            if group.num_rows == 0:
                return pa.table({"bucket": pa.array([], pa.int32()),
                                 "salt": pa.array([], pa.int32()),
                                 "path": pa.array([], pa.string())})
            b = int(group.column("bucket")[0].as_py())
            salt = int(group.column("salt")[0].as_py())
            # merge each term's partial runs in docid order
            g = group.sort_by([("term", "ascending")])
            terms = g.column("term").to_pylist()
            docids_col = g.column("docids")
            tfs_col = g.column("tfs")
            out_terms, out_blobs, out_df, out_ttf = [], [], [], []
            i = 0
            nrows = len(terms)
            while i < nrows:
                j = i
                while j < nrows and terms[j] == terms[i]:
                    j += 1
                runs = []
                for r in range(i, j):
                    ids = np.asarray(docids_col[r].as_py(), dtype=np.int64)
                    tfs = np.asarray(tfs_col[r].as_py(), dtype=np.int64)
                    runs.append((ids, tfs))
                runs.sort(key=lambda x: int(x[0][0]))
                ids = np.concatenate([x[0] for x in runs])
                tfs = np.concatenate([x[1] for x in runs]).astype(np.uint32)
                out_terms.append(terms[i])
                out_df.append(len(ids))
                out_ttf.append(int(tfs.sum()))
                out_blobs.append((ids, tfs))
                i = j
            piece = os.path.join(sdir, "pieces", f"spart_{b:04d}_{salt:04d}")
            os.makedirs(os.path.dirname(piece), exist_ok=True)
            # raw (not yet norm-scored) — impacts need norms which need the
            # full norms array; stage C encodes with norms available
            arrs = pa.table(
                {
                    "term": pa.array(out_terms, pa.large_string()),
                    "df": pa.array(out_df, pa.int64()),
                    "ttf": pa.array(out_ttf, pa.int64()),
                    "docids": pa.array(
                        [x[0].tolist() for x in out_blobs], pa.list_(pa.int64())
                    ),
                    "tfs": pa.array(
                        [x[1].tolist() for x in out_blobs], pa.list_(pa.int32())
                    ),
                }
            )
            pq.write_table(arrs, piece + ".parquet.tmp")
            os.replace(piece + ".parquet.tmp", piece + ".parquet")
            return pa.table({"bucket": pa.array([b], pa.int32()),
                             "salt": pa.array([salt], pa.int32()),
                             "path": pa.array([piece + ".parquet"], pa.string())})

        piece_rows = (
            partials.groupby(["bucket", "salt"])
            .map_groups(assemble, batch_format="pyarrow")
            .take_all()
        )
    finally:
        ctx.target_min_block_size = prev_min

    # finalize norms/docmap (driver-side concat; at cluster scale this
    # would stay sharded with offsets in meta)
    pieces_dir = os.path.join(sdir, "pieces")
    piece_metas = sorted(
        (json.load(open(os.path.join(pieces_dir, f))) for f in os.listdir(pieces_dir)
         if f.startswith("piece_")),
        key=lambda m: m["pid"],
    )
    norms_parts = [
        np.fromfile(os.path.join(pieces_dir, f"norms_{m['pid']:06d}.bin"), dtype=np.uint8)
        for m in piece_metas
    ]
    norms = np.concatenate(norms_parts)
    with open(os.path.join(sdir, "norms.bin"), "wb") as f:
        f.write(norms.tobytes())
    docmaps = [
        pq.read_table(os.path.join(pieces_dir, f"docmap_{m['pid']:06d}.parquet"))
        for m in piece_metas
    ]
    pq.write_table(pa.concat_tables(docmaps), os.path.join(sdir, "docmap.parquet"))

    # stage C: per bucket, merge salt pieces (ordered concat for hot terms),
    # encode with impacts, write the final part files
    by_bucket: Dict[int, List[tuple]] = {}
    for r in piece_rows:
        by_bucket.setdefault(int(r["bucket"]), []).append((int(r["salt"]), r["path"]))
    specs = [
        {"bucket": b, "paths": json.dumps([p for _, p in sorted(ps)])}
        for b, ps in sorted(by_bucket.items())
    ]

    import ray

    norms_ref = ray.put(norms)

    @ray.remote
    def stage_c(bucket: int, paths_json: str) -> str:
        nrm = ray.get(norms_ref)
        srcs = [pq.read_table(p) for p in json.loads(paths_json)]
        # gather per-term runs across salt pieces (salt order == docid order)
        agg: Dict[str, List[tuple]] = {}
        stats: Dict[str, List[int]] = {}
        for t in srcs:
            terms = t.column("term").to_pylist()
            for i, term in enumerate(terms):
                ids = np.asarray(t.column("docids")[i].as_py(), dtype=np.int64)
                tfs = np.asarray(t.column("tfs")[i].as_py(), dtype=np.uint32)
                agg.setdefault(term, []).append((ids, tfs))
        rows = {"term": [], "df": [], "ttf": [], "post_off": [], "post_len": [],
                "pos_off": [], "pos_len": []}
        blobs: List[bytes] = []
        off = 0
        for term in sorted(agg):
            runs = agg[term]
            runs.sort(key=lambda x: int(x[0][0]))
            ids = np.concatenate([x[0] for x in runs]).astype(np.uint32)
            tfs = np.concatenate([x[1] for x in runs]).astype(np.uint32)
            blob = encode_postings(ids, tfs, nrm[ids])
            rows["term"].append(term)
            rows["df"].append(len(ids))
            rows["ttf"].append(int(tfs.sum()))
            rows["post_off"].append(off)
            rows["post_len"].append(len(blob))
            rows["pos_off"].append(0)
            rows["pos_len"].append(0)
            blobs.append(blob)
            off += len(blob)
        data = b"".join(blobs)
        with open(os.path.join(sdir, f"part_{bucket:04d}.postings.bin"), "wb") as f:
            f.write(data)
        tbl = pa.table(
            {
                "term": pa.array(rows["term"], pa.large_string()),
                "df": pa.array(rows["df"], pa.int64()),
                "ttf": pa.array(rows["ttf"], pa.int64()),
                "post_off": pa.array(rows["post_off"], pa.int64()),
                "post_len": pa.array(rows["post_len"], pa.int64()),
                "pos_off": pa.array(rows["pos_off"], pa.int64()),
                "pos_len": pa.array(rows["pos_len"], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(sdir, f"part_{bucket:04d}.terms.parquet"))
        return json.dumps({"bucket": bucket, "n_terms": len(rows["term"]),
                           "sum_df": int(sum(rows["df"])), "bytes": off})

    results = [json.loads(r) for r in ray.get(
        [stage_c.remote(s["bucket"], s["paths"]) for s in specs]
    )]
    # buckets with no terms still need (empty) part files for the reader
    have = {r["bucket"] for r in results}
    for b in range(config.num_buckets):
        if b not in have:
            open(os.path.join(sdir, f"part_{b:04d}.postings.bin"), "wb").close()
            empty = pa.table({k: pa.array([], pa.large_string() if k == "term" else pa.int64())
                              for k in ["term", "df", "ttf", "post_off", "post_len", "pos_off", "pos_len"]})
            pq.write_table(empty, os.path.join(sdir, f"part_{b:04d}.terms.parquet"))

    import shutil

    shutil.rmtree(pieces_dir, ignore_errors=True)

    meta = {
        "seg_id": 0,
        "base_docid": 0,
        "n_docs": int(sum(m["n_docs"] for m in piece_metas)),
        "doc_count": int(sum(m["doc_count"] for m in piece_metas)),
        "sum_ttf": int(sum(m["sum_ttf"] for m in piece_metas)),
        "sum_df": int(sum(r["sum_df"] for r in results)),
        "n_terms": int(sum(r["n_terms"] for r in results)),
        "n_parts": config.num_buckets,
        "positions": False,
        "key_type": "unknown",
        "bytes": sum(r["bytes"] for r in results),
        "checksums": {},
        "hot_terms": sorted(hot),
        "build": "shuffle",
        "lineage": [
            {"path": p["path"], "row_start": p["row_start"], "row_end": p["row_end"]}
            for p in plan
        ],
        "metrics": {"build_s": None, "docs_per_s": None,
                    "postings_bytes": sum(r["bytes"] for r in results)},
    }
    with open(os.path.join(sdir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return commit_manifest(index_dir, config, [meta])
