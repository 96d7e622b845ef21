"""Match-set export — the streaming SINK surface: evaluate a query and
write its FULL match set (key, global docid, score) to partitioned
Parquet, one Ray task and one output file per segment, atomically
(tmp + rename) so a re-run skips finished partitions. Nothing about the
match set ever lands on the driver — at 100 TB the match set of a broad
query is itself big data.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa

from lucene_ray.search.query import (
    deduplicate_clauses,
    parse_query,
    query_terms,
)
from lucene_ray.search.searcher import IndexSearcher


def export_matches(
    index_dir: str,
    query: str,
    out_dir: str,
    concurrency: Optional[int] = None,
) -> int:
    """→ number of exported rows. Layout: ``out_dir/seg=<seg_id>/part.parquet``
    (one partition per segment — the input shard granularity the task
    brief's resumability rule asks for)."""
    import ray
    import ray.data

    from lucene_ray.index.manifest import load_manifest

    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    os.makedirs(out_dir, exist_ok=True)

    # Resume markers are only valid for the SAME query: a `_query.json`
    # manifest pins (query, index generation) for the out_dir, and a partition
    # written under a different query is discarded, not counted as done.
    import hashlib as _hl
    import json as _json

    qhash = _hl.blake2b(
        f"{query}|gen={man.generation}".encode(), digest_size=8
    ).hexdigest()
    man_path = os.path.join(out_dir, "_query.json")
    stale = False
    if os.path.exists(man_path):
        try:
            with open(man_path) as f:
                stale = _json.load(f).get("qhash") != qhash
        except Exception:
            stale = True
    if stale:
        import shutil

        for name in os.listdir(out_dir):
            if name.startswith("seg="):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    tmp_man = man_path + f".tmp{os.getpid()}"
    with open(tmp_man, "w") as f:
        _json.dump({"qhash": qhash, "query": query}, f)
    os.replace(tmp_man, man_path)

    items = [{"seg_id": int(s["seg_id"])} for s in man.segments]

    class ExportSegment:
        """One actor-held searcher; each input row exports one segment."""

        def __init__(self):
            self.searcher = IndexSearcher(index_dir)
            self.by_seg = {}
            for si, seg in enumerate(self.searcher.segments):
                self.by_seg[int(seg.meta["seg_id"])] = (si, seg)

        def __call__(self, batch: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.parquet as pq

            s = self.searcher
            q = deduplicate_clauses(
                parse_query(query, s.analyzer), s.sim.compute_query_term_weight
            )
            states = s.term_states(query_terms(q))
            out_sid, out_rows = [], []
            for sid in batch.column("seg_id").to_pylist():
                si, seg = self.by_seg[int(sid)]
                part_dir = os.path.join(out_dir, f"seg={int(sid):06d}")
                dest = os.path.join(part_dir, "part.parquet")
                if os.path.exists(dest):  # resume: partition done
                    out_sid.append(int(sid))
                    out_rows.append(pq.ParquetFile(dest).metadata.num_rows)
                    continue
                r = s._eval(q, si, states)
                keys = (
                    seg.docmap.take(pa.array(r.docids.astype(np.int64)))
                    if len(r.docids)
                    else seg.docmap.slice(0, 0)
                )
                t = pa.table(
                    {
                        "key": keys,
                        "docid": pa.array(
                            r.docids.astype(np.int64) + seg.base_docid
                        ),
                        "score": pa.array(r.scores, pa.float32()),
                    }
                )
                os.makedirs(part_dir, exist_ok=True)
                tmp = dest + f".tmp{os.getpid()}"
                pq.write_table(t, tmp)
                os.replace(tmp, dest)
                out_sid.append(int(sid))
                out_rows.append(t.num_rows)
            return pa.table(
                {
                    "seg_id": pa.array(out_sid, pa.int64()),
                    "rows": pa.array(out_rows, pa.int64()),
                }
            )

    # from_items blocks come straight from the driver's input buffer — no
    # upstream CPU tasks, so the actor pool can own every CPU without
    # deadlocking a small ray.init (a repartition here starves at num_cpus=4).
    ds = ray.data.from_items(items, override_num_blocks=len(items))
    from lucene_ray.cluster import actor_pool

    meta = ds.map_batches(
        ExportSegment,
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool(cap=max(1, len(items))),
        batch_size=1,
    ).take_all()  # one meta row per segment — tiny
    return int(sum(r["rows"] for r in meta))
