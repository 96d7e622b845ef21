"""MultiIndexMergeScheduler: merges from several indexes drain through
one shared Ray task pool; each index commits independently
(``core/index/MultiIndexMergeScheduler.java:39-60`` semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import load_manifest
from lucene_ray.index.merge import TieredMergePolicy
from lucene_ray.index.multi_merge import MultiIndexMergeScheduler
from lucene_ray.index.temporal_merge import TemporalMergePolicy
from lucene_ray.search.searcher import IndexSearcher

NOW = 1_000_000_000


def make_index(tmp_path, name, n=160, with_ts=False):
    rng = np.random.default_rng(hash(name) % 2**31)
    words = ["red", "green", "blue", "cyan", "teal"]
    cols = {
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(
            [" ".join(rng.choice(words, size=5).tolist()) for _ in range(n)]
        ),
    }
    if with_ts:
        cols["ts"] = pa.array(
            (NOW - 900 + np.arange(n)).astype(np.int64)
        )
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))
    idx = str(tmp_path / name)
    cfg = IndexConfig(
        rows_per_segment=20, dv_cols=("ts",) if with_ts else ()
    )
    build_index(str(tmp_path / f"{name}.parquet"), idx, cfg)
    return idx


class TestMultiIndexMergeScheduler:
    def test_two_tenants_merge_through_shared_pool(self, ray_session, tmp_path):
        a = make_index(tmp_path, "a")
        b = make_index(tmp_path, "b")
        before_a = IndexSearcher(a).search("red green", k=20)
        before_b = IndexSearcher(b).search("blue teal", k=20)
        n_a = len(load_manifest(a).segments)
        n_b = len(load_manifest(b).segments)
        assert n_a == 8 and n_b == 8

        sched = MultiIndexMergeScheduler(max_in_flight=4)
        sched.register(a, TieredMergePolicy(segs_per_tier=2.0))
        sched.register(b, TieredMergePolicy(segs_per_tier=2.0))
        out = sched.merge_to_completion()
        assert len(out[a].segments) < n_a
        assert len(out[b].segments) < n_b

        after_a = IndexSearcher(a).search("red green", k=20)
        after_b = IndexSearcher(b).search("blue teal", k=20)
        assert list(before_a["keys"]) == list(after_a["keys"])
        assert np.array_equal(before_a["scores"], after_a["scores"])
        assert list(before_b["keys"]) == list(after_b["keys"])
        assert np.array_equal(before_b["scores"], after_b["scores"])

    def test_mixed_policies_one_pool(self, ray_session, tmp_path):
        a = make_index(tmp_path, "ma")
        t = make_index(tmp_path, "mt", with_ts=True)
        sched = MultiIndexMergeScheduler()
        sched.register(a, TieredMergePolicy(segs_per_tier=2.0))
        sched.register(
            t,
            TemporalMergePolicy(
                temporal_field="ts",
                now_seconds=NOW,
                min_threshold=2,
                compaction_ratio=1.0,
            ),
        )
        out = sched.run_round()
        assert len(out[a].segments) < 8
        assert len(out[t].segments) < 8

    def test_no_merges_is_noop(self, ray_session, tmp_path):
        a = make_index(tmp_path, "nn")
        from lucene_ray.index.merge import force_merge

        force_merge(a, 1)
        n = len(load_manifest(a).segments)
        sched = MultiIndexMergeScheduler().register(a)
        out = sched.run_round()
        assert len(out[a].segments) == n

    def test_missing_manifest_raises(self, ray_session, tmp_path):
        sched = MultiIndexMergeScheduler().register(str(tmp_path / "nope"))
        with pytest.raises(FileNotFoundError):
            sched.run_round()
