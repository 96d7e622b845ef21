"""Geo points: GeoEncodingUtils quantization parity, morton order,
GeoBlocks box/distance == naive scan, pipeline vs DuckDB oracle."""
import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.index.geo import (
    EARTH_MEAN_RADIUS_METERS,
    LATITUDE_DECODE,
    LONGITUDE_DECODE,
    GeoBlocks,
    circle_to_bbox,
    decode_latitude,
    decode_longitude,
    encode_latitude,
    encode_longitude,
    haversin_meters,
    morton_interleave,
)


class TestEncoding:
    def test_quantization_constants(self):
        assert LATITUDE_DECODE == 90.0 / 2**31
        assert LONGITUDE_DECODE == 180.0 / 2**31

    def test_golden_values(self):
        # GeoEncodingUtils: floor quantization; decode is exact inverse
        assert int(encode_latitude(0.0)) == 0
        assert int(encode_latitude(-90.0)) == -(2**31)
        assert int(encode_latitude(90.0)) == 2**31 - 1  # clamped
        assert int(encode_longitude(-180.0)) == -(2**31)
        assert int(encode_longitude(180.0)) == 2**31 - 1
        # just below +90 still encodes in-range (float rounding may land
        # on the max code — same as Lucene's floor of the same quotient)
        assert int(encode_latitude(90.0 - LATITUDE_DECODE)) in (
            2**31 - 2,
            2**31 - 1,
        )

    @given(st.floats(min_value=-90.0, max_value=90.0))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_error_bound(self, lat):
        dec = float(decode_latitude(encode_latitude(lat)))
        assert dec <= lat or lat == 90.0
        assert abs(dec - lat) <= LATITUDE_DECODE * (1 + 1e-9)

    @given(
        st.floats(min_value=-180.0, max_value=180.0),
        st.floats(min_value=-180.0, max_value=180.0),
    )
    @settings(max_examples=100, deadline=None)
    def test_morton_preserves_locality_order(self, a, b):
        # same point → same key; monotone in each axis when other fixed
        ea, eb = encode_longitude(a), encode_longitude(b)
        la = encode_latitude(np.array([0.0, 0.0]))
        m = morton_interleave(la, np.array([int(ea), int(eb)], np.int32))
        assert (m[0] < m[1]) == (int(ea) < int(eb)) or int(ea) == int(eb)


def _rand_points(n, seed):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    return encode_latitude(lat), encode_longitude(lon)


class TestGeoBlocks:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_box_equals_scan(self, seed):
        la, lo = _rand_points(5000, seed)
        ids = np.arange(5000)
        gb = GeoBlocks(la, lo, ids, block_size=256)
        rng = np.random.default_rng(seed + 100)
        for _ in range(20):
            a, b = np.sort(rng.uniform(-90, 90, 2))
            c, d = np.sort(rng.uniform(-180, 180, 2))
            got = np.sort(gb.box(a, b, c, d))
            want = ids[
                (la >= int(encode_latitude(a)))
                & (la <= int(encode_latitude(b)))
                & (lo >= int(encode_longitude(c)))
                & (lo <= int(encode_longitude(d)))
            ]
            assert np.array_equal(got, want)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_distance_equals_scan(self, seed):
        la, lo = _rand_points(4000, seed)
        ids = np.arange(4000)
        gb = GeoBlocks(la, lo, ids, block_size=256)
        rng = np.random.default_rng(seed + 7)
        for _ in range(10):
            clat = rng.uniform(-85, 85)
            clon = rng.uniform(-180, 180)
            r = rng.uniform(1e4, 5e6)
            got = np.sort(gb.distance(clat, clon, r))
            d = haversin_meters(
                decode_latitude(la), decode_longitude(lo), clat, clon
            )
            want = ids[d <= r]
            assert np.array_equal(got, want)

    def test_distance_near_pole_full_lon(self):
        la, lo = _rand_points(2000, 5)
        ids = np.arange(2000)
        gb = GeoBlocks(la, lo, ids, block_size=128)
        got = np.sort(gb.distance(89.5, 10.0, 2_000_000.0))
        d = haversin_meters(
            decode_latitude(la), decode_longitude(lo), 89.5, 10.0
        )
        assert np.array_equal(got, ids[d <= 2_000_000.0])

    def test_bbox_contains_circle(self):
        rng = np.random.default_rng(3)
        for _ in range(50):
            clat = rng.uniform(-89, 89)
            clon = rng.uniform(-179, 179)
            r = rng.uniform(1e3, 3e6)
            b0, b1, b2, b3 = circle_to_bbox(clat, clon, r)
            # sample points ON the circle via small-circle param
            th = np.linspace(0, 2 * np.pi, 64)
            rr = r / EARTH_MEAN_RADIUS_METERS
            plat = np.degrees(
                np.arcsin(
                    np.sin(np.radians(clat)) * np.cos(rr)
                    + np.cos(np.radians(clat)) * np.sin(rr) * np.cos(th)
                )
            )
            plon = clon + np.degrees(
                np.arctan2(
                    np.sin(th) * np.sin(rr) * np.cos(np.radians(clat)),
                    np.cos(rr)
                    - np.sin(np.radians(clat)) * np.sin(np.radians(plat)),
                )
            )
            inside_lat = (plat >= b0 - 1e-9) & (plat <= b1 + 1e-9)
            assert inside_lat.all()
            if b2 > -180.0 or b3 < 180.0:
                assert ((plon >= b2 - 1e-9) & (plon <= b3 + 1e-9)).all()


SF = "/root/testdata/sf0.001"


class TestPipelineOracle:
    def _con(self):
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from '{SF}/documents.parquet'"
        )
        return con

    def test_box_matches_oracle(self, ray_session):
        from lucene_ray.pipelines.geo import geo_box_search, sql_geo_box_search

        got = geo_box_search(SF).to_pandas()
        want = self._con().execute(sql_geo_box_search()).df()
        assert len(got) == len(want) > 0
        assert np.array_equal(got["doc_id"].values, want["doc_id"].values)
        assert np.array_equal(got["lat"].values, want["lat"].values)
        assert np.array_equal(got["lon"].values, want["lon"].values)

    def test_distance_matches_oracle(self, ray_session):
        from lucene_ray.pipelines.geo import (
            geo_distance_search,
            sql_geo_distance_search,
        )

        got = geo_distance_search(SF).to_pandas()
        want = self._con().execute(sql_geo_distance_search()).df()
        assert len(got) == len(want) > 0
        assert np.array_equal(got["doc_id"].values, want["doc_id"].values)
        assert np.array_equal(got["lat"].values, want["lat"].values)
        assert np.array_equal(got["lon"].values, want["lon"].values)
