"""TemporalMergePolicy: time-window bucketing, in-window planning, and
end-to-end Ray merges that never cross window boundaries.

Reference semantics: ``core/index/TemporalMergePolicy.java:783-930``
(getBucketForTimestamp, planWindowMerges) — formulas mirrored exactly;
within-window ordering follows this engine's contiguous docid-base
constraint (documented divergence, rank-neutral).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import load_manifest
from lucene_ray.index.temporal_merge import (
    OLD_DATA_BUCKET,
    TemporalMergePolicy,
    segment_ts_range,
    temporal_merge_round,
)
from lucene_ray.search.searcher import IndexSearcher

NOW = 1_000_000_000  # pinned "now" (seconds)


def pol(**kw):
    kw.setdefault("temporal_field", "ts")
    kw.setdefault("now_seconds", NOW)
    return TemporalMergePolicy(**kw)


class TestBucketing:
    def test_recent_uses_base_window(self):
        p = pol(base_time_seconds=3600)
        ts = NOW - 100
        assert p.bucket_for(ts, NOW) == (ts // 3600) * 3600

    def test_exponential_growth_by_min_threshold(self):
        p = pol(base_time_seconds=3600, min_threshold=4)
        # age 2h < base*4 → still base window
        ts = NOW - 2 * 3600
        assert p.bucket_for(ts, NOW) == (ts // 3600) * 3600
        # age 5h ≥ base*4 → 4h window (5h < 4h*4 keeps it there)
        ts = NOW - 5 * 3600
        w = 3600 * 4
        assert p.bucket_for(ts, NOW) == (ts // w) * w
        # age 20h ≥ 4h*4 → 16h window; 20h < 16h*4 → stays 16h
        ts = NOW - 20 * 3600
        w = 3600 * 16
        assert p.bucket_for(ts, NOW) == (ts // w) * w

    def test_window_capped_at_max(self):
        p = pol(base_time_seconds=3600, max_window_size_seconds=8 * 3600)
        ts = NOW - 400 * 3600
        w = 8 * 3600
        assert p.bucket_for(ts, NOW) == (ts // w) * w

    def test_fixed_windows_when_disabled(self):
        p = pol(base_time_seconds=600, use_exponential_buckets=False)
        for age in (10, 10_000, 10_000_000):
            ts = NOW - age
            assert p.bucket_for(ts, NOW) == (ts // 600) * 600

    def test_old_data_sentinel_and_future_ts(self):
        p = pol(max_age_seconds=86_400)
        assert p.bucket_for(NOW - 2 * 86_400, NOW) == OLD_DATA_BUCKET
        # future timestamps clamp to age 0 (newest bucket)
        ts = NOW + 500
        assert p.bucket_for(ts, NOW) == (ts // 3600) * 3600

    def test_validation(self):
        with pytest.raises(ValueError):
            TemporalMergePolicy(temporal_field="")
        with pytest.raises(ValueError):
            pol(base_time_seconds=0)
        with pytest.raises(ValueError):
            pol(min_threshold=4, max_threshold=2)


def metas(ranges):
    """Synthetic segment metas: seg i covers docids [i*100, (i+1)*100)."""
    return [
        {"seg_id": i, "base_docid": i * 100, "n_docs": 100}
        for i in range(len(ranges))
    ]


class TestPlanning:
    def test_min_threshold_gate(self):
        ranges = {i: (NOW - 50, NOW - 10) for i in range(3)}
        p = pol(range_overrides=ranges, min_threshold=4)
        assert p.find_merges(metas(ranges)) == []

    def test_same_window_merges_in_max_threshold_batches(self):
        ranges = {i: (NOW - 50, NOW - 10) for i in range(10)}
        p = pol(
            range_overrides=ranges,
            min_threshold=4,
            max_threshold=8,
            compaction_ratio=1.0,
        )
        m = p.find_merges(metas(ranges))
        # aggressive: batch of 8, remaining 2 < min_threshold stay
        assert m == [[0, 1, 2, 3, 4, 5, 6, 7]]

    def test_cross_window_never_merges(self):
        # 4 recent + 4 old (different windows), interleaved contiguity
        ranges = {}
        for i in range(4):
            ranges[i] = (NOW - 50, NOW - 10)  # recent window
        for i in range(4, 8):
            old = NOW - 40 * 3600
            ranges[i] = (old - 50, old)  # 16h-window bucket
        p = pol(range_overrides=ranges, min_threshold=4, compaction_ratio=1.0)
        m = p.find_merges(metas(ranges))
        assert sorted(map(sorted, m)) == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_old_bucket_not_compacted(self):
        ranges = {i: (NOW - 10 * 86_400, NOW - 9 * 86_400) for i in range(6)}
        p = pol(range_overrides=ranges, max_age_seconds=86_400)
        assert p.find_merges(metas(ranges)) == []

    def test_compaction_ratio_gate(self):
        # largest=100 each; with ratio 1.2, 2 segs: 200 >= ceil(120) fires
        # only once min_threshold reached
        ranges = {i: (NOW - 50, NOW - 10) for i in range(4)}
        p = pol(range_overrides=ranges, min_threshold=2, max_threshold=8,
                compaction_ratio=1.2)
        m = p.find_merges(metas(ranges))
        assert m and m[0][:2] == [0, 1]

    def test_contiguity_respected(self):
        # window members 0,1,3 (2 in another window) → runs [0,1] and [3];
        # min_threshold=2 merges only the contiguous pair
        ranges = {
            0: (NOW - 50, NOW - 10),
            1: (NOW - 50, NOW - 10),
            2: (NOW - 40 * 3600, NOW - 40 * 3600 + 10),
            3: (NOW - 50, NOW - 10),
        }
        p = pol(range_overrides=ranges, min_threshold=2, compaction_ratio=1.0)
        m = p.find_merges(metas(ranges))
        assert [0, 1] in m and all(3 not in batch for batch in m)


class TestEndToEnd:
    def test_temporal_merge_preserves_results(self, ray_session, tmp_path):
        rng = np.random.default_rng(5)
        n = 240
        # time-ordered corpus: first half old (40h ago), second half recent
        ts = np.concatenate(
            [
                NOW - 40 * 3600 + np.arange(n // 2),
                NOW - 1800 + np.arange(n // 2),
            ]
        ).astype(np.int64)
        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        texts = [
            " ".join(rng.choice(words, size=6).tolist()) for _ in range(n)
        ]
        docs = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "ts": pa.array(ts),
            }
        )
        pq.write_table(docs, str(tmp_path / "docs.parquet"))
        idx = str(tmp_path / "idx")
        build_index(
            str(tmp_path / "docs.parquet"),
            idx,
            IndexConfig(rows_per_segment=30, dv_cols=("ts",)),
        )
        man = load_manifest(idx)
        assert len(man.segments) == 8
        before = IndexSearcher(idx).search("alpha beta", k=20)

        p = pol(min_threshold=2, max_threshold=4, compaction_ratio=1.0)
        man2 = temporal_merge_round(idx, p)
        # old half (4 segs) merged; recent half (4 segs) merged; never mixed
        assert len(man2.segments) < 8
        for s in man2.segments:
            from lucene_ray.index.manifest import segment_dir

            sdir = s.get("dir") or segment_dir(idx, s["seg_id"])
            lo, hi = segment_ts_range(sdir, "ts")
            # every surviving segment is entirely old or entirely recent
            assert (hi < NOW - 3600) or (lo > NOW - 7200)

        after = IndexSearcher(idx).search("alpha beta", k=20)
        assert list(before["keys"]) == list(after["keys"])
        assert np.array_equal(before["scores"], after["scores"])

    def test_ts_range_from_footer_stats(self, ray_session, tmp_path):
        docs = pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(["x"] * 10),
                "ts": pa.array([NOW - i for i in range(10)], pa.int64()),
            }
        )
        pq.write_table(docs, str(tmp_path / "d.parquet"))
        idx = str(tmp_path / "i")
        build_index(
            str(tmp_path / "d.parquet"),
            idx,
            IndexConfig(rows_per_segment=100, dv_cols=("ts",)),
        )
        from lucene_ray.index.manifest import segment_dir

        man = load_manifest(idx)
        sdir = segment_dir(idx, man.segments[0]["seg_id"])
        assert segment_ts_range(sdir, "ts") == (NOW - 9, NOW)
        assert segment_ts_range(sdir, "nope") is None

    def test_unit_autodetect(self):
        from lucene_ray.index.temporal_merge import _to_seconds

        assert _to_seconds(NOW) == NOW
        assert _to_seconds(NOW * 1000) == NOW
        assert _to_seconds(NOW * 1_000_000) == NOW
