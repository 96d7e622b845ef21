"""addIndexes-style bulk segment import — adopt foreign COMMITTED
segments into this index's next manifest generation, file-verbatim.

The analogue of ``IndexWriter.addIndexes(Directory...)``
(``core/index/IndexWriter.java:3051``): Lucene copies the source
segments' files unchanged into the destination directory under fresh
segment names and registers them in the next ``segments_N`` — no
re-tokenization, no re-encode, docids stay segment-local. Here each
adopted segment directory is copied (hard-linked when the filesystem
allows — byte-identical, near-free) into ``segments/seg_<new>`` via the
same tmp-dir + atomic-rename discipline as ``write_segment``, its
``meta.json`` is rewritten with the new ``seg_id`` and a rebased
``base_docid``, and one new manifest generation commits the union.
Aggregated collection statistics are recomputed from the combined
segment rows (``aggregate_field_stats``), exactly as Lucene's
``CollectionStatistics`` re-derives over the new leaf set.

Scale shape: one Ray task per adopted segment performs the copy (the
segment is the unit of work, as everywhere else in this engine), so a
10^12-doc import is a flat fan-out bounded by segment count; the driver
only moves meta rows. Contrast with ``MultiReader``
(``search/searcher.py``) which composes indexes at SEARCH time without
touching files — addIndexes makes the adoption durable, after which the
imported segments merge, delete and checkpoint like native ones.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Sequence

from lucene_ray.index.manifest import (
    Manifest,
    commit_manifest,
    load_manifest,
    segment_dir,
)

_COMPAT_KEYS = (
    "key_type",
    "positions",
    "offsets",
    "index_sort",
    # merge assumes uniform term-hash part counts across readers
    # (merge.py uses readers[0].n_parts for all); refuse mixed counts
    # at adoption time rather than corrupting a later tiered merge
    "num_buckets",
    # mixed vector-bearing/vector-less merges would silently drop the
    # vector sidecars; refuse at adoption time
    "vector_col",
)


def _check_compat(dest_cfg_json: dict, src_cfg_json: dict, src: str) -> None:
    """Reject imports whose on-disk format the destination cannot read
    uniformly — Lucene's addIndexes likewise refuses incompatible index
    sorts (``IndexWriter.java`` validate() on addIndexes)."""
    for k in _COMPAT_KEYS:
        a, b = dest_cfg_json.get(k), src_cfg_json.get(k)
        if a != b:
            raise ValueError(
                f"addIndexes: incompatible config {k!r}: dest={a!r} "
                f"src[{src}]={b!r}"
            )


def _copy_tree_linked(src: str, dst_tmp: str) -> None:
    """Copy a segment dir file-by-file, hard-linking when possible
    (same-device byte-identical adoption — the fast path Lucene gets
    from Directory.copyFrom)."""
    os.makedirs(dst_tmp, exist_ok=True)
    for name in os.listdir(src):
        s = os.path.join(src, name)
        d = os.path.join(dst_tmp, name)
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)


def _adopt_one(
    src_seg_dir: str, dest_index_dir: str, new_seg_id: int, new_base: int
) -> dict:
    """Copy one committed segment into the destination under its new
    identity; returns the rewritten meta row. Atomic: tmp dir + rename,
    so a crashed import leaves no half-segment (resume = rerun)."""
    dst = segment_dir(dest_index_dir, new_seg_id)
    if os.path.exists(os.path.join(dst, "meta.json")):
        # Idempotency: reuse a pre-existing segment dir ONLY if it is the
        # same adoption (same source, same rebased docid base). A retry
        # after the destination changed (e.g. a merge ran between
        # attempts) must rebuild, or a stale meta with an overlapping
        # base_docid would break global docid uniqueness.
        with open(os.path.join(dst, "meta.json")) as f:
            existing = json.load(f)
        lin = existing.get("lineage") or {}
        if lin.get("imported_from") == os.path.abspath(
            src_seg_dir
        ) and int(existing.get("base_docid", -1)) == int(new_base):
            return existing
        shutil.rmtree(dst)
    tmp = dst + f".tmp{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _copy_tree_linked(src_seg_dir, tmp)
    with open(os.path.join(src_seg_dir, "meta.json")) as f:
        meta = json.load(f)
    meta["seg_id"] = int(new_seg_id)
    meta["base_docid"] = int(new_base)
    lineage = meta.get("lineage") or {}
    lineage["imported_from"] = os.path.abspath(src_seg_dir)
    meta["lineage"] = lineage
    # meta.json is replaced, not linked: rewrite it inside the tmp dir
    mp = os.path.join(tmp, "meta.json")
    os.unlink(mp)
    with open(mp, "w") as f:
        json.dump(meta, f)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.replace(tmp, dst)
    return meta


def add_indexes(
    dest_index_dir: str, src_index_dirs: Sequence[str]
) -> Manifest:
    """Import every committed segment of ``src_index_dirs`` into
    ``dest_index_dir`` and commit one new manifest generation.

    Docid rebasing follows MultiReader docBase accumulation: within a
    source index segments keep their relative base offsets; across
    sources (and after the destination's own maxDoc) bases shift by the
    accumulated maxDoc, so global docids remain unique and the
    (score, docid) tie-break ordering of a subsequent search equals a
    MultiReader over the original indexes.
    """
    import ray

    dest_man = load_manifest(dest_index_dir)
    if dest_man is None:
        raise FileNotFoundError(f"no manifest in {dest_index_dir}")
    dest_cfg = dest_man.config.to_json()
    rows: List[dict] = list(dest_man.segments)
    doc_base = max(
        (int(s["base_docid"]) + int(s["n_docs"]) for s in rows), default=0
    )
    next_id = max((int(s["seg_id"]) for s in rows), default=-1) + 1

    adopt = ray.remote(num_cpus=1)(_adopt_one)
    futs = []
    for src in src_index_dirs:
        sman = load_manifest(src)
        if sman is None:
            raise FileNotFoundError(f"no manifest in {src}")
        _check_compat(dest_cfg, sman.config.to_json(), src)
        segs = sorted(sman.segments, key=lambda s: int(s["base_docid"]))
        if not segs:
            continue
        src_min = int(segs[0]["base_docid"])
        src_max = 0
        for s in segs:
            rel = int(s["base_docid"]) - src_min
            futs.append(
                adopt.remote(
                    segment_dir(src, int(s["seg_id"])),
                    dest_index_dir,
                    next_id,
                    doc_base + rel,
                )
            )
            next_id += 1
            src_max = max(src_max, rel + int(s["n_docs"]))
        doc_base += src_max
    rows.extend(ray.get(futs))
    return commit_manifest(dest_index_dir, dest_man.config, rows)
