"""DateTools — dates as sortable strings / truncated longs, the role of
``core/document/DateTools.java:40-160``.

The reference converts dates to zero-padded GMT strings whose
lexicographic order equals chronological order (``yyyyMMddHHmmssSSS``
truncated to a resolution) so term-range queries over date fields work,
plus ``round`` for truncating epoch millis to a resolution. Re-expressed
here with scalar helpers AND vectorized (numpy datetime64 / Arrow
timestamp) variants for ``map_batches`` columns.

All arithmetic is UTC (the reference uses the GMT calendar).
"""

from __future__ import annotations

from enum import Enum
from typing import Union

import numpy as np
import pyarrow as pa


class Resolution(Enum):
    # value = formatted length, like the reference's formatLen
    YEAR = 4
    MONTH = 6
    DAY = 8
    HOUR = 10
    MINUTE = 12
    SECOND = 14
    MILLISECOND = 17


_NP_UNIT = {
    Resolution.YEAR: "Y",
    Resolution.MONTH: "M",
    Resolution.DAY: "D",
    Resolution.HOUR: "h",
    Resolution.MINUTE: "m",
    Resolution.SECOND: "s",
    Resolution.MILLISECOND: "ms",
}


def _components(ms: np.ndarray):
    """Vectorized UTC calendar fields from epoch-millis int64."""
    dt = ms.astype("datetime64[ms]")
    Y = dt.astype("datetime64[Y]")
    M = dt.astype("datetime64[M]")
    D = dt.astype("datetime64[D]")
    h = dt.astype("datetime64[h]")
    m = dt.astype("datetime64[m]")
    s = dt.astype("datetime64[s]")
    year = Y.astype(np.int64) + 1970
    month = (M - Y).astype(np.int64) + 1
    day = (D - M).astype(np.int64) + 1
    hour = (h - D).astype(np.int64)
    minute = (m - h).astype(np.int64)
    sec = (s - m).astype(np.int64)
    milli = (dt - s).astype(np.int64)
    return year, month, day, hour, minute, sec, milli


def _pad(a: np.ndarray, width: int) -> np.ndarray:
    return np.char.zfill(a.astype("U" + str(width + 6)), width)


def time_to_string(ms, resolution: Resolution) -> Union[str, np.ndarray]:
    """Epoch millis → sortable GMT string truncated to ``resolution``
    (``DateTools.timeToString``). Scalar in → scalar out; array in →
    array of strings (one vectorized pass, no Python datetime objects)."""
    scalar = np.isscalar(ms)
    arr = np.atleast_1d(np.asarray(ms, dtype=np.int64))
    arr = round_time(arr, resolution)
    y, mo, d, h, mi, s, mil = _components(arr)
    parts = [
        _pad(y, 4),
        _pad(mo, 2),
        _pad(d, 2),
        _pad(h, 2),
        _pad(mi, 2),
        _pad(s, 2),
        _pad(mil, 3),
    ]
    need = {
        Resolution.YEAR: 1,
        Resolution.MONTH: 2,
        Resolution.DAY: 3,
        Resolution.HOUR: 4,
        Resolution.MINUTE: 5,
        Resolution.SECOND: 6,
        Resolution.MILLISECOND: 7,
    }[resolution]
    out = parts[0]
    for p in parts[1:need]:
        out = np.char.add(out, p)
    return out[0] if scalar else out


def string_to_time(s: Union[str, "np.ndarray"]) -> Union[int, np.ndarray]:
    """Sortable date string → epoch millis; the resolution is inferred
    from the string length (``DateTools.stringToTime``)."""

    def one(v: str) -> int:
        n = len(v)
        try:
            res = Resolution(n)
        except ValueError:
            raise ValueError(f"Input is not a valid date string: {v!r}")
        full = v + "19700101000000000"[n:]
        y = int(full[0:4])
        mo = int(full[4:6]) or 1
        d = int(full[6:8]) or 1
        h, mi, sec, mil = (
            int(full[8:10]),
            int(full[10:12]),
            int(full[12:14]),
            int(full[14:17]),
        )
        base = np.datetime64(f"{y:04d}-{mo:02d}-{d:02d}", "ms")
        ms = (
            base.astype(np.int64)
            + ((h * 60 + mi) * 60 + sec) * 1000
            + mil
        )
        del res
        return int(ms)

    if isinstance(s, str):
        return one(s)
    return np.array([one(str(v)) for v in np.asarray(s)], dtype=np.int64)


def round_time(ms, resolution: Resolution) -> Union[int, np.ndarray]:
    """Truncate epoch millis DOWN to the resolution (``DateTools.round``:
    2004-09-21 13:50:11 → 2004-09-01 00:00:00 at MONTH)."""
    scalar = np.isscalar(ms)
    arr = np.asarray(ms, dtype=np.int64).astype("datetime64[ms]")
    out = (
        arr.astype(f"datetime64[{_NP_UNIT[resolution]}]")
        .astype("datetime64[ms]")
        .astype(np.int64)
    )
    return int(out) if scalar else out


def column_to_sortable(col: pa.ChunkedArray, resolution: Resolution) -> pa.Array:
    """Arrow timestamp column → large_string sortable-date column, one
    vectorized pass (the map_batches-facing variant)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ms = col.cast(pa.timestamp("ms")).cast(pa.int64())
    strs = time_to_string(np.asarray(ms, dtype=np.int64), resolution)
    return pa.array(strs.tolist(), pa.large_string())
