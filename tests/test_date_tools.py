"""DateTools: sortable date strings, resolution rounding, round-trips
(``core/document/DateTools.java`` semantics, UTC)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.date_tools import (
    Resolution,
    column_to_sortable,
    round_time,
    string_to_time,
    time_to_string,
)

# 2004-09-21 13:50:11.123 UTC
TS = int(np.datetime64("2004-09-21T13:50:11.123", "ms").astype(np.int64))


class TestScalar:
    @pytest.mark.parametrize(
        "res,expect",
        [
            (Resolution.YEAR, "2004"),
            (Resolution.MONTH, "200409"),
            (Resolution.DAY, "20040921"),
            (Resolution.HOUR, "2004092113"),
            (Resolution.MINUTE, "200409211350"),
            (Resolution.SECOND, "20040921135011"),
            (Resolution.MILLISECOND, "20040921135011123"),
        ],
    )
    def test_time_to_string(self, res, expect):
        assert time_to_string(TS, res) == expect

    def test_round_month_zeroes_lower_fields(self):
        r = round_time(TS, Resolution.MONTH)
        assert time_to_string(r, Resolution.MILLISECOND) == "20040901000000000"

    def test_string_to_time_round_trip(self):
        for res in Resolution:
            s = time_to_string(TS, res)
            assert string_to_time(s) == round_time(TS, res)

    def test_string_sort_order_equals_time_order(self):
        times = [TS, TS - 86_400_000 * 400, TS + 123, TS + 86_400_000]
        strs = [time_to_string(t, Resolution.MILLISECOND) for t in times]
        assert sorted(strs) == [
            time_to_string(t, Resolution.MILLISECOND) for t in sorted(times)
        ]

    def test_bad_string_raises(self):
        with pytest.raises(ValueError):
            string_to_time("20049")  # length matches no resolution


class TestVectorized:
    def test_matches_scalar(self):
        rng = np.random.default_rng(3)
        times = rng.integers(0, 2_000_000_000_000, size=200)
        for res in (Resolution.DAY, Resolution.MINUTE, Resolution.MILLISECOND):
            vec = time_to_string(times, res)
            assert list(vec) == [time_to_string(int(t), res) for t in times]

    def test_round_vectorized(self):
        times = np.array([TS, TS + 59_000, TS + 61_000], dtype=np.int64)
        r = round_time(times, Resolution.MINUTE)
        assert list(r) == [round_time(int(t), Resolution.MINUTE) for t in times]

    def test_arrow_column(self):
        col = pa.chunked_array(
            [pa.array([TS, TS + 1000], pa.timestamp("ms"))]
        )
        out = column_to_sortable(col, Resolution.SECOND)
        assert out.to_pylist() == ["20040921135011", "20040921135012"]
