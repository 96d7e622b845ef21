"""Index-resident geo + range fields (round 5): segment sidecars via
``IndexConfig.geo_cols`` / ``range_cols``, searcher query nodes
(GeoBoxQuery / GeoDistanceQuery / RangeFieldQuery), merge survival,
deletes masking, CheckIndex health, null exclusion."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.deletes import delete_by_keys
from lucene_ray.index.geo import (
    decode_latitude,
    decode_longitude,
    encode_latitude,
    encode_longitude,
    haversin_meters,
)
from lucene_ray.index.merge import force_merge
from lucene_ray.index.ranges import RangeBlocks, build_range_files
from lucene_ray.index.segment import SegmentReader
from lucene_ray.search.query import (
    GeoBoxQuery,
    GeoDistanceQuery,
    RangeFieldQuery,
)
from lucene_ray.search.searcher import IndexSearcher

N = 3000
WORDS = ["alpha", "beta", "gamma", "delta"]


def _table(with_nulls: bool = True) -> pa.Table:
    rng = np.random.default_rng(42)
    lat = rng.uniform(-90, 90, N)
    lon = rng.uniform(-180, 180, N)
    lo = rng.integers(0, 1000, N)
    hi = lo + 1 + rng.integers(0, 120, N)
    lat_a = pa.array(lat)
    lon_a = pa.array(lon)
    lo_a = pa.array(lo, pa.int64())
    hi_a = pa.array(hi, pa.int64())
    if with_nulls:
        # every 37th doc has no point; every 41st no interval
        lat_mask = np.arange(N) % 37 == 0
        iv_mask = np.arange(N) % 41 == 0
        lat_a = pa.array([None if m else v for m, v in zip(lat_mask, lat)])
        lo_a = pa.array(
            [None if m else int(v) for m, v in zip(iv_mask, lo)], pa.int64()
        )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N), pa.int64()),
            "text": pa.array([WORDS[i % 4] for i in range(N)]),
            "lat": lat_a,
            "lon": lon_a,
            "lo": lo_a,
            "hi": hi_a,
        }
    )


CFG = IndexConfig(
    rows_per_segment=700,
    num_buckets=2,
    dv_cols=("lat", "lon", "lo", "hi"),
    geo_cols=(("loc", "lat", "lon"),),
    range_cols=(("iv", "lo", "hi"),),
)


@pytest.fixture(scope="module")
def geo_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("geo_idx")
    src = os.path.join(root, "docs.parquet")
    pq.write_table(_table(), src)
    idx = os.path.join(root, "index")
    build_index(src, idx, CFG)
    return idx, _table()


def _brute(tbl: pa.Table):
    lat = np.array(
        [v if v is not None else np.nan for v in tbl.column("lat").to_pylist()]
    )
    lon = np.asarray(tbl.column("lon"), dtype=np.float64)
    lo = np.array(
        [v if v is not None else -(10**9) for v in tbl.column("lo").to_pylist()],
        dtype=np.int64,
    )
    hi = np.asarray(tbl.column("hi"), dtype=np.int64)
    has_pt = ~np.isnan(lat)
    has_iv = np.array(
        [v is not None for v in tbl.column("lo").to_pylist()]
    )
    return lat, lon, lo, hi, has_pt, has_iv


class TestGeoResident:
    def test_meta_and_files(self, geo_index):
        idx, _ = geo_index
        s = IndexSearcher(idx)
        assert len(s.segments) > 1  # multi-segment: sidecar per segment
        for seg in s.segments:
            info = seg.meta["geo"]["loc"]
            assert info["lat_col"] == "lat" and info["n"] > 0
            for sfx in ("lat", "lon", "docs", "dir"):
                assert os.path.exists(
                    os.path.join(seg.seg_dir, f"geo_loc.{sfx}.bin")
                )
            assert f"geo_loc.{sfx}.bin" in seg.meta["checksums"]

    def test_box_equals_scan_and_excludes_nulls(self, geo_index):
        idx, tbl = geo_index
        lat, lon, _, _, has_pt, _ = _brute(tbl)
        s = IndexSearcher(idx)
        for box in [(-30, 40, -90, 10), (10, 11, -180, 180), (50, 90, 100, 170)]:
            r = s.search(GeoBoxQuery("loc", *box), k=10**9)
            la_e = encode_latitude(np.nan_to_num(lat))
            lo_e = encode_longitude(lon)
            want = np.flatnonzero(
                has_pt
                & (la_e >= int(encode_latitude(box[0])))
                & (la_e <= int(encode_latitude(box[1])))
                & (lo_e >= int(encode_longitude(box[2])))
                & (lo_e <= int(encode_longitude(box[3])))
            )
            got = np.sort([int(k) for k in r["keys"]])
            assert np.array_equal(got, want)

    def test_distance_equals_scan(self, geo_index):
        idx, tbl = geo_index
        lat, lon, _, _, has_pt, _ = _brute(tbl)
        s = IndexSearcher(idx)
        la_d = decode_latitude(encode_latitude(np.nan_to_num(lat)))
        lo_d = decode_longitude(encode_longitude(lon))
        for clat, clon, r_m in [(12.0, -7.0, 3e6), (-60.0, 150.0, 8e6)]:
            r = s.search(GeoDistanceQuery("loc", clat, clon, r_m), k=10**9)
            d = haversin_meters(la_d, lo_d, clat, clon)
            want = np.flatnonzero(has_pt & (d <= r_m))
            got = np.sort([int(k) for k in r["keys"]])
            assert np.array_equal(got, want)

    def test_merge_survival_and_checkindex(self, geo_index):
        idx, tbl = geo_index
        s0 = IndexSearcher(idx)
        before = np.sort(
            [int(k) for k in s0.search(GeoBoxQuery("loc", -30, 40, -90, 10), k=10**9)["keys"]]
        )
        force_merge(idx, max_segments=1)
        assert check_index(idx) == []
        s1 = IndexSearcher(idx)
        assert len(s1.segments) == 1
        assert s1.segments[0].meta["geo"]["loc"]["n"] > 0
        after = np.sort(
            [int(k) for k in s1.search(GeoBoxQuery("loc", -30, 40, -90, 10), k=10**9)["keys"]]
        )
        assert np.array_equal(before, after)
        # range sidecar also survives the merge
        rr = s1.search(RangeFieldQuery("iv", "intersects", 200, 420), k=10**9)
        assert len(rr["keys"]) > 0


class TestRangeResident:
    def test_relations_equal_scan(self, geo_index):
        idx, tbl = geo_index
        _, _, lo, hi, _, has_iv = _brute(tbl)
        s = IndexSearcher(idx)
        for a, b in [(200, 420), (0, 999), (500, 501)]:
            masks = {
                "intersects": (lo <= b) & (hi >= a),
                "within": (lo >= a) & (hi <= b),
                "contains": (lo <= a) & (hi >= b),
            }
            masks["crosses"] = (
                masks["intersects"] & ~masks["within"] & ~masks["contains"]
            )
            for rel, m in masks.items():
                r = s.search(RangeFieldQuery("iv", rel, a, b), k=10**9)
                got = np.sort([int(k) for k in r["keys"]])
                assert np.array_equal(got, np.flatnonzero(has_iv & m)), rel

    def test_blocks_equal_scan_property(self):
        rng = np.random.default_rng(7)
        lo = rng.integers(0, 10_000, 20_000).astype(np.int64)
        hi = lo + rng.integers(0, 3_000, 20_000)
        ids = np.arange(20_000, dtype=np.uint32)
        rb = RangeBlocks(lo, hi, ids, block_size=512)
        for _ in range(25):
            a, b = np.sort(rng.integers(0, 13_000, 2))
            for rel, m in {
                "intersects": (lo <= b) & (hi >= a),
                "within": (lo >= a) & (hi <= b),
                "contains": (lo <= a) & (hi >= b),
            }.items():
                got = rb.relate(rel, int(a), int(b))
                assert np.array_equal(got, ids[m]), rel
            got = rb.relate("crosses", int(a), int(b))
            m = (
                ((lo <= b) & (hi >= a))
                & ~((lo >= a) & (hi <= b))
                & ~((lo <= a) & (hi >= b))
            )
            assert np.array_equal(got, ids[m])

    def test_invalid_interval_rejected(self):
        t = pa.table(
            {
                "lo": pa.array([5, 10], pa.int64()),
                "hi": pa.array([4, 20], pa.int64()),
            }
        )
        with pytest.raises(ValueError, match="lo <= hi"):
            build_range_files(t, (("iv", "lo", "hi"),))


class TestDeletesAndErrors:
    def test_deletes_mask_geo_and_range(self, ray_session, tmp_path):
        src = os.path.join(tmp_path, "docs.parquet")
        pq.write_table(_table(with_nulls=False), src)
        idx = os.path.join(tmp_path, "index")
        build_index(src, idx, CFG)
        s = IndexSearcher(idx)
        all_box = set(
            int(k)
            for k in s.search(GeoBoxQuery("loc", -90, 90, -180, 180), k=10**9)["keys"]
        )
        victims = sorted(all_box)[:25]
        delete_by_keys(idx, victims)
        s2 = IndexSearcher(idx)
        got = set(
            int(k)
            for k in s2.search(GeoBoxQuery("loc", -90, 90, -180, 180), k=10**9)["keys"]
        )
        assert got == all_box - set(victims)
        got_r = set(
            int(k)
            for k in s2.search(
                RangeFieldQuery("iv", "intersects", 0, 10**6), k=10**9
            )["keys"]
        )
        assert got_r == all_box - set(victims)

    def test_missing_sidecar_raises(self, ray_session, tmp_path):
        src = os.path.join(tmp_path, "docs.parquet")
        pq.write_table(_table(with_nulls=False), src)
        idx = os.path.join(tmp_path, "index")
        build_index(src, idx, IndexConfig(rows_per_segment=2048))
        s = IndexSearcher(idx)
        with pytest.raises(KeyError, match="geo sidecar"):
            s.search(GeoBoxQuery("loc", -10, 10, -10, 10), k=5)
        with pytest.raises(KeyError, match="range sidecar"):
            s.search(RangeFieldQuery("iv", "within", 1, 2), k=5)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="geo_cols"):
            IndexConfig(geo_cols=(("loc", "lat", "lon"),))
        with pytest.raises(ValueError, match="range_cols"):
            IndexConfig(range_cols=(("iv", "lo", "hi"),))

    def test_bad_relation_rejected(self, geo_index):
        idx, _ = geo_index
        s = IndexSearcher(idx)
        with pytest.raises(ValueError, match="relation"):
            s.search(RangeFieldQuery("iv", "overlaps", 1, 2), k=5)


class TestDistanceSort:
    def test_matches_oracle(self, ray_session):
        import duckdb

        from lucene_ray.pipelines.geo import (
            geo_distance_sort,
            sql_geo_distance_sort,
        )

        SF = "/root/testdata/sf0.001"
        got = geo_distance_sort(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from "
            f"'{SF}/documents.parquet'"
        )
        want = con.execute(sql_geo_distance_sort()).df()
        assert len(got) == len(want) > 0
        for c in ["rank", "doc_id", "dist_cm"]:
            assert (got[c].values == want[c].values).all(), c
        # ascending distance, dense ranks
        assert (np.diff(got["dist_cm"].values) >= 0).all()
        assert got["rank"].tolist() == list(range(len(got)))
