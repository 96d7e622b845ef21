"""Regression tests for the round-4 ADVICE items (fixed in round 5):

1. list-typed DV columns get the SortedSetDocValuesWriter discipline
   (per-doc dedup+sort) at segment-write time, so facet_counts counts a
   doc once per distinct value even when the caller supplies duplicates;
2. invert_token_lists validates payload/token alignment PER DOC (not
   just total flattened length) and narrows 64-bit-offset payload types;
3. replication pins the tombstone generation recorded in the manifest —
   a newer tombstone landing between manifest load and the listing must
   not ship with the older manifest;
4. lang_id's trigram pack is covered in test_lang_id.py (unicode
   injectivity + brute-force parity).
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.segment import invert_token_lists, normalize_sorted_set_dv


class TestSortedSetDVNormalize:
    def test_dedup_and_sort(self):
        t = pa.table(
            {
                "tags": pa.array(
                    [["b", "a", "b", "a"], ["z"], [], None],
                    pa.list_(pa.string()),
                ),
                "plain": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
        out = normalize_sorted_set_dv(t)
        assert out.column("tags").to_pylist() == [["a", "b"], ["z"], [], []]
        # non-list columns untouched
        assert out.column("plain").to_pylist() == [1, 2, 3, 4]

    def test_numeric_lists(self):
        t = pa.table(
            {"nums": pa.array([[3, 1, 3, 2], [5, 5]], pa.list_(pa.int64()))}
        )
        out = normalize_sorted_set_dv(t)
        assert out.column("nums").to_pylist() == [[1, 2, 3], [5]]

    def test_all_empty(self):
        t = pa.table({"x": pa.array([[], []], pa.list_(pa.string()))})
        out = normalize_sorted_set_dv(t)
        assert out.column("x").to_pylist() == [[], []]

    def test_facet_counts_dedup_duplicates_at_build(self, ray_session, tmp_path):
        # duplicates supplied by the CALLER must count once per doc
        # (SortedSetDocValuesFacetCounts semantics)
        from lucene_ray.search.searcher import IndexSearcher

        n = 30
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": ["data point"] * n,
                "tags": pa.array(
                    [["dup", "dup", "other"]] * n, pa.list_(pa.string())
                ),
            }
        )
        src = str(tmp_path / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(tmp_path / "idx")
        build_index(
            src,
            idx,
            IndexConfig(rows_per_segment=15, num_buckets=2, dv_cols=("tags",)),
        )
        s = IndexSearcher(idx)
        got = dict(
            zip(
                s.facet_counts("data", "tags").column("value").to_pylist(),
                s.facet_counts("data", "tags").column("n").to_pylist(),
            )
        )
        assert got == {"dup": n, "other": n}


class TestPayloadAlignment:
    def test_per_doc_mismatch_rejected(self):
        toks = pa.array([["a", "b"], ["c", "d"]], pa.list_(pa.string()))
        pays = pa.array(
            [[b"x", b"y", b"z"], [b"w"]], pa.list_(pa.binary())
        )  # total 4 payloads for 4 tokens — per-doc counts still mismatch
        with pytest.raises(ValueError, match="misaligned at doc 0"):
            invert_token_lists(toks, True, payloads=pays)

    def test_large_binary_payloads_narrowed(self):
        toks = pa.array([["a"], ["b"]], pa.list_(pa.string()))
        pays = pa.array([[b"x"], [b"yy"]], pa.list_(pa.large_binary()))
        inv = invert_token_lists(toks, True, payloads=pays)
        assert inv.pay_lens.tolist() == [1, 2]
        assert bytes(inv.pay_bytes.tobytes()) == b"xyy"

    def test_aligned_still_works(self):
        toks = pa.array([["a", "b"], ["c"]], pa.list_(pa.string()))
        pays = pa.array([[b"1", b"2"], [b"3"]], pa.list_(pa.binary()))
        inv = invert_token_lists(toks, True, payloads=pays)
        assert int(inv.pay_lens.sum()) == 3


class TestReplicationTombstonePinning:
    def test_newer_tombstone_not_shipped(self, ray_session, tmp_path):
        from lucene_ray.index.deletes import delete_by_keys
        from lucene_ray.index.manifest import load_manifest
        from lucene_ray.search.replicate import PrimaryNode

        n = 20
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": [f"word{i} common" for i in range(n)],
            }
        )
        src = str(tmp_path / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, IndexConfig(rows_per_segment=n, num_buckets=2))
        delete_by_keys(idx, [1, 2])
        man = load_manifest(idx)
        assert man.segments[0].get("del_gen") == 1
        # simulate a commit racing the listing: a NEWER tombstone lands
        # on disk after the manifest we serve
        seg_rel = os.path.join("segments", "seg_000000")
        newer = os.path.join(idx, seg_rel, "deleted_000002.bits")
        with open(newer, "wb") as f:
            f.write(b"\xff\xff\xff")
        state = PrimaryNode(idx).current_state()
        files = state["files"]
        assert os.path.join(seg_rel, "deleted_000001.bits") in files
        assert os.path.join(seg_rel, "deleted_000002.bits") not in files

    def test_replica_visibility_matches_manifest(self, ray_session, tmp_path):
        from lucene_ray.index.deletes import delete_by_keys
        from lucene_ray.search.replicate import PrimaryNode, ReplicaNode

        n = 16
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": ["common text"] * n,
            }
        )
        src = str(tmp_path / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, IndexConfig(rows_per_segment=n, num_buckets=2))
        delete_by_keys(idx, [0])
        primary = PrimaryNode(idx)
        state = primary.current_state()
        # a second deletion lands AFTER the state snapshot
        delete_by_keys(idx, [1, 2, 3])
        rep = ReplicaNode(str(tmp_path / "replica"))
        rep.sync(primary, state=state)
        from lucene_ray.search.searcher import IndexSearcher

        s = IndexSearcher(str(tmp_path / "replica"))
        r = s.count("common")
        assert r == n - 1  # the snapshot's visibility, not the later commit's
