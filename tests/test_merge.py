"""Merge property tests (SURVEY §5): querying a merged index must be
byte-identical to querying the unmerged one — scores, keys, global docids;
planner behavior; resume interplay after merges."""

import json
import os
import shutil

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import load_manifest
from lucene_ray.index.merge import (
    TieredMergePolicy,
    force_merge,
    merge_round,
    merge_segments,
)
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

QUERIES = ["spark", "merge table", "+batch +stream -window", '"data data"', "the customer"]


@pytest.fixture()
def two_indexes(ray_session, tmp_path):
    """Identical 8-segment indexes; one gets merged."""
    cfg = IndexConfig(rows_per_segment=64, num_buckets=2)
    d_ref = str(tmp_path / "ref")
    d_merge = str(tmp_path / "merged")
    build_index(DOCS, d_ref, cfg)
    build_index(DOCS, d_merge, cfg)
    return d_ref, d_merge


def results(index_dir, k=20):
    s = IndexSearcher(index_dir)
    return {
        q: {
            "docids": list(map(int, r["docids"])),
            "scores": [float(x) for x in r["scores"]],
            "keys": r["keys"],
            "total": r["total_hits"],
        }
        for q in QUERIES
        for r in [s.search(q, k)]
    }


class TestMergeRankNeutral:
    def test_force_merge_identical_results(self, two_indexes):
        d_ref, d_merge = two_indexes
        before = results(d_merge)
        man = force_merge(d_merge, 2)
        assert len(man.segments) <= 2
        after = results(d_merge)
        ref = results(d_ref)
        assert after == ref == before

    def test_merge_round_tiered(self, two_indexes):
        d_ref, d_merge = two_indexes
        pol = TieredMergePolicy(
            segs_per_tier=2.0, max_merge_at_once=4, floor_segment_bytes=1 << 30
        )
        man0 = load_manifest(d_merge)
        man1 = merge_round(d_merge, pol)
        assert len(man1.segments) < len(man0.segments)
        assert man1.generation == man0.generation + 1
        assert results(d_merge) == results(d_ref)
        # stats preserved exactly
        assert man1.field_stats == man0.field_stats

    def test_merged_segment_meta(self, two_indexes, tmp_path):
        _, d_merge = two_indexes
        man = load_manifest(d_merge)
        segs = sorted(man.segments, key=lambda s: s["base_docid"])[:2]
        new_id = max(s["seg_id"] for s in man.segments) + 1
        meta = merge_segments(d_merge, [s["seg_id"] for s in segs], new_id, man.config)
        assert meta["n_docs"] == sum(s["n_docs"] for s in segs)
        assert meta["sum_ttf"] == sum(s["sum_ttf"] for s in segs)
        assert meta["merged_from"] == [s["seg_id"] for s in segs]
        assert meta["base_docid"] == segs[0]["base_docid"]

    def test_non_contiguous_merge_rejected(self, two_indexes):
        _, d_merge = two_indexes
        man = load_manifest(d_merge)
        segs = sorted(man.segments, key=lambda s: s["base_docid"])
        with pytest.raises(ValueError, match="non-contiguous"):
            merge_segments(
                d_merge, [segs[0]["seg_id"], segs[2]["seg_id"]], 999, man.config
            )


class TestPolicy:
    def _mk(self, sizes):
        return [
            {
                "seg_id": i,
                "base_docid": i * 100,
                "bytes": sz,
                "metrics": {"postings_bytes": sz},
            }
            for i, sz in enumerate(sizes)
        ]

    def test_no_merge_when_under_budget(self):
        pol = TieredMergePolicy(segs_per_tier=8.0, floor_segment_bytes=1 << 20)
        assert pol.find_merges(self._mk([1 << 20] * 4)) == []

    def test_merges_small_tier(self):
        pol = TieredMergePolicy(segs_per_tier=2.0, floor_segment_bytes=1 << 30)
        merges = pol.find_merges(self._mk([1000] * 10))
        assert merges, "10 tiny segments over a 2-per-tier budget must merge"
        for m in merges:
            assert 2 <= len(m) <= pol.max_merge_at_once

    def test_respects_max_merged_bytes(self):
        pol = TieredMergePolicy(
            segs_per_tier=1.0, max_merge_at_once=10,
            floor_segment_bytes=1, max_merged_segment_bytes=2500,
        )
        merges = pol.find_merges(self._mk([1000] * 6))
        for m in merges:
            assert len(m) <= 3  # 3 * 1000 > 2500 would stop at 3


class TestResumeAfterMerge:
    def test_build_resume_does_not_rebuild_merged(self, ray_session, tmp_path):
        d = str(tmp_path / "idx")
        cfg = IndexConfig(rows_per_segment=64, num_buckets=1)
        build_index(DOCS, d, cfg)
        man1 = force_merge(d, 1)
        assert len(man1.segments) == 1
        # re-entrant build over the same input must keep the merged segment
        man2 = build_index(DOCS, d, cfg)
        assert [s["seg_id"] for s in man2.segments] == [
            s["seg_id"] for s in man1.segments
        ]
        assert man2.field_stats == man1.field_stats
        s = IndexSearcher(d)
        assert len(s.search("spark", 5)["docids"]) == 5
