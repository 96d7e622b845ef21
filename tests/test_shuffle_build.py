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
