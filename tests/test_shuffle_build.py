"""Shuffle build (groupby-term + salting) must produce search results
identical to the segmented build on the same corpus (both DOCS_AND_FREQS):
same top-k docids, keys, float32 scores, term stats."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import load_manifest
from lucene_ray.index.shuffle_build import build_index_shuffled, detect_hot_terms
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

QUERIES = ["spark", "the", "merge table", "customer window vector", "+batch +stream"]


@pytest.fixture(scope="module")
def both_indexes(ray_session, tmp_path_factory):
    cfg_seg = IndexConfig(rows_per_segment=100, num_buckets=2, positions=False)
    cfg_shuf = IndexConfig(rows_per_segment=100, num_buckets=3, positions=False,
                           hot_term_df_ratio=0.5, num_salts=3)
    d_seg = str(tmp_path_factory.mktemp("seg"))
    d_shuf = str(tmp_path_factory.mktemp("shuf"))
    build_index(DOCS, d_seg, cfg_seg)
    build_index_shuffled(DOCS, d_shuf, cfg_shuf)
    return d_seg, d_shuf


class TestShuffleBuild:
    def test_hot_terms_detected(self):
        cfg = IndexConfig(hot_term_df_ratio=0.5)
        hot = detect_hot_terms([DOCS], cfg)
        assert "batch" in hot or "data" in hot  # head vocab terms
        assert "zzzmissing" not in hot

    def test_stats_identical(self, both_indexes):
        d_seg, d_shuf = both_indexes
        a = load_manifest(d_seg).field_stats
        b = load_manifest(d_shuf).field_stats
        assert a == b

    def test_salting_metadata_recorded(self, both_indexes):
        _, d_shuf = both_indexes
        man = load_manifest(d_shuf)
        assert man.segments[0]["build"] == "shuffle"
        assert len(man.segments[0]["hot_terms"]) > 0

    @pytest.mark.parametrize("q", QUERIES)
    def test_search_identical(self, both_indexes, q):
        d_seg, d_shuf = both_indexes
        a = IndexSearcher(d_seg).search(q, 20)
        b = IndexSearcher(d_shuf).search(q, 20)
        assert a["keys"] == b["keys"], q
        assert np.array_equal(a["scores"], b["scores"]), q
        # global docids agree too (same docid assignment from the plan)
        assert list(a["docids"]) == list(b["docids"])

    def test_term_stats_identical(self, both_indexes):
        d_seg, d_shuf = both_indexes
        def stats(d):
            s = IndexSearcher(d)
            out = {}
            for seg in s.segments:
                for term, df, ttf, _, _ in seg.all_terms():
                    cur = out.get(term, (0, 0))
                    out[term] = (cur[0] + df, cur[1] + ttf)
            return out
        assert stats(d_seg) == stats(d_shuf)

    def test_positions_rejected(self, tmp_path, ray_session):
        with pytest.raises(ValueError, match="positions"):
            build_index_shuffled(
                DOCS, str(tmp_path / "x"), IndexConfig(positions=True)
            )


class TestShuffleHardening:
    """Round-2: two-phase commit, stage-granular resume, range buckets."""

    def test_range_buckets_global_order_and_check(self, ray_session, tmp_path):
        from lucene_ray.index.check import check_index
        from lucene_ray.index.segment import SegmentReader
        from lucene_ray.index.manifest import segment_dir

        cfg = IndexConfig(rows_per_segment=120, num_buckets=4, positions=False)
        d = str(tmp_path / "rb")
        build_index_shuffled(DOCS, d, cfg)
        seg = SegmentReader(segment_dir(d, 0))
        assert seg.meta["bucket_mode"] == "range"
        splits = seg.meta["bucket_splits"]
        assert len(splits) == 3
        # global order: every term in bucket b < every term in bucket b+1
        prev_last = None
        n_nonempty = 0
        for b in range(seg.n_parts):
            terms = seg.terms_list(b)
            if not terms:
                continue
            n_nonempty += 1
            if prev_last is not None:
                assert prev_last < terms[0]
            prev_last = terms[-1]
        assert n_nonempty >= 2
        assert check_index(d) == []
        # prefix expansion touches only the overlapping buckets
        hits = seg.expand_terms("s")
        assert all(t.startswith("s") for t, _ in hits)
        assert [t for t, _ in hits] == sorted(t for t, _ in hits)

    def test_committed_segment_short_circuits(self, ray_session, tmp_path):
        """Resume point 1: a committed segment makes the build a no-op
        (manifest re-commit only)."""
        import os

        cfg = IndexConfig(rows_per_segment=100, num_buckets=3, positions=False,
                          hot_term_df_ratio=0.5, num_salts=3)
        d = str(tmp_path / "resume")
        man1 = build_index_shuffled(DOCS, d, cfg)
        t0 = os.path.getmtime(
            os.path.join(d, "segments", "seg_000000", "meta.json")
        )
        man2 = build_index_shuffled(DOCS, d, cfg)
        t1 = os.path.getmtime(
            os.path.join(d, "segments", "seg_000000", "meta.json")
        )
        assert t0 == t1  # segment untouched
        assert man2.segments[0]["n_docs"] == man1.segments[0]["n_docs"]

    def test_stage_b_pieces_reused(self, ray_session, tmp_path, monkeypatch):
        """True stage-B resume: stop the build right after the stage-B
        manifest is written, then re-run — stage A must NOT run again."""
        import os

        import lucene_ray.index.shuffle_build as sb

        cfg = IndexConfig(rows_per_segment=100, num_buckets=3, positions=False,
                          hot_term_df_ratio=0.5, num_salts=3)
        d = str(tmp_path / "sb")

        real_atomic = sb._atomic_write
        class _Stop(RuntimeError):
            pass

        def boom(path, data):
            real_atomic(path, data)
            if path.endswith("stageb.json"):
                raise _Stop()

        monkeypatch.setattr(sb, "_atomic_write", boom)
        with pytest.raises(_Stop):
            build_index_shuffled(DOCS, d, cfg)
        monkeypatch.setattr(sb, "_atomic_write", real_atomic)

        calls = {"n": 0}
        real_analyze = sb._analyze_partition

        def counting(*a, **k):
            calls["n"] += 1
            return real_analyze(*a, **k)

        monkeypatch.setattr(sb, "_analyze_partition", counting)
        man = build_index_shuffled(DOCS, d, cfg)
        assert calls["n"] == 0  # stage A skipped: pieces intact
        assert man.segments[0]["n_docs"] == 500

        d_ref = str(tmp_path / "ref")
        build_index_shuffled(DOCS, d_ref, cfg)
        s_a, s_b = IndexSearcher(d), IndexSearcher(d_ref)
        for q in QUERIES:
            ra, rb = s_a.search(q, k=10), s_b.search(q, k=10)
            assert list(ra["docids"]) == list(rb["docids"])
            assert np.array_equal(ra["scores"], rb["scores"])
