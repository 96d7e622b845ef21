"""2-D geo-point index — the ``LatLonPoint`` role.

Reference semantics: ``core/document/LatLonPoint.java``,
``core/geo/GeoEncodingUtils.java`` (int32 lat/lon quantization),
``core/geo/GeoUtils.java`` (earth radius, circle→bbox),
``core/search/LatLonPointDistanceQuery.java`` (bbox prune + haversine
refine) and the 2-D BKD tree (``core/util/bkd/BKDWriter.java``).

Lucene stores each point as two quantized int32s inside a 2-D BKD tree;
a box query visits only the leaf cells overlapping the box and a
distance query first prunes by the circle's bounding box, then refines
survivors with the haversine distance.  The columnar equivalent built
here (:class:`GeoBlocks`) replaces the k-d split with a **Z-order
(morton) sort + per-block lat/lon min-max directory**: points are
sorted by the 64-bit interleave of their quantized coordinates, so each
fixed-size block covers a compact spatial cell, and a query scans only
the blocks whose min-max rectangle overlaps — the same leaf-pruning
effect with plain vectorized kernels and no pointer tree.  Results are
IDENTICAL to a full scan (property-tested in ``tests/test_geo.py``).

Encoding parity with the reference (``GeoEncodingUtils``): latitude is
quantized by ``floor(lat / (90 / 2^31))`` into int32 (longitude with
180), ``+90 == nextDown`` clamped so the max value doesn't overflow,
and decoded by the exact inverse multiply.  Quantization error is
≤ ~4.2e-8 degrees (~4.6 mm), identical to Lucene's.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = [
    "LATITUDE_DECODE",
    "LONGITUDE_DECODE",
    "EARTH_MEAN_RADIUS_METERS",
    "encode_latitude",
    "encode_longitude",
    "decode_latitude",
    "decode_longitude",
    "morton_interleave",
    "haversin_meters",
    "circle_to_bbox",
    "GeoBlocks",
    "build_geo_files",
]

# GeoEncodingUtils.java: LATITUDE_DECODE = 90.0/0x1p31, LONGITUDE_DECODE
# = 180.0/0x1p31 — one int32 step is the decode unit.
LATITUDE_DECODE = 90.0 / 2147483648.0
LONGITUDE_DECODE = 180.0 / 2147483648.0

# GeoUtils.java: mean earth radius (meters) used by haversinMeters.
EARTH_MEAN_RADIUS_METERS = 6_371_008.7714


def encode_latitude(lat) -> np.ndarray:
    """Degrees → int32 (floor quantization; +90 clamped like
    ``GeoEncodingUtils.encodeLatitude``)."""
    lat = np.asarray(lat, dtype=np.float64)
    e = np.floor(lat / LATITUDE_DECODE)
    # lat == +90 would encode to 2^31 (overflow); Lucene nextDowns it,
    # which lands on the max representable code.
    return np.minimum(e, 2147483647.0).astype(np.int32)


def encode_longitude(lon) -> np.ndarray:
    """Degrees → int32 (floor quantization; +180 clamped)."""
    lon = np.asarray(lon, dtype=np.float64)
    e = np.floor(lon / LONGITUDE_DECODE)
    return np.minimum(e, 2147483647.0).astype(np.int32)


def decode_latitude(enc) -> np.ndarray:
    return np.asarray(enc, dtype=np.float64) * LATITUDE_DECODE


def decode_longitude(enc) -> np.ndarray:
    return np.asarray(enc, dtype=np.float64) * LONGITUDE_DECODE


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread each bit of a uint32 into the even bits of a uint64."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_interleave(lat_enc: np.ndarray, lon_enc: np.ndarray) -> np.ndarray:
    """int32 (lat, lon) codes → uint64 Z-order key, sign-flipped first so
    unsigned morton order matches signed coordinate order."""
    la = (lat_enc.astype(np.int64) + 2147483648).astype(np.uint32)
    lo = (lon_enc.astype(np.int64) + 2147483648).astype(np.uint32)
    return (_part1by1(lo) << np.uint64(1)) | _part1by1(la)


def haversin_meters(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance (meters, mean-radius sphere) between
    degree coordinates — the ``SloppyMath.haversinMeters`` role, computed
    with the textbook float64 haversine."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, dtype=np.float64)) - np.radians(
        np.asarray(lon1, dtype=np.float64)
    )
    a = (
        np.sin(dp / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    )
    return 2.0 * EARTH_MEAN_RADIUS_METERS * np.arcsin(np.sqrt(a))


def circle_to_bbox(
    lat: float, lon: float, radius_m: float
) -> Tuple[float, float, float, float]:
    """Conservative (minLat, maxLat, minLon, maxLon) degrees box
    enclosing the circle (``GeoUtils.circleToBbox`` role).  Near a pole
    or across the antimeridian the longitude range degrades to the full
    [-180, 180] — a wider prune, never a wrong one."""
    r = radius_m / EARTH_MEAN_RADIUS_METERS  # radians
    dlat = np.degrees(r)
    min_lat, max_lat = lat - dlat, lat + dlat
    if min_lat <= -90.0 or max_lat >= 90.0:
        return max(min_lat, -90.0), min(max_lat, 90.0), -180.0, 180.0
    # asin argument is <= 1 away from the poles (guarded above)
    dlon = np.degrees(
        np.arcsin(np.sin(r) / np.cos(np.radians(lat)))
    )
    min_lon, max_lon = lon - dlon, lon + dlon
    if min_lon < -180.0 or max_lon > 180.0:
        return min_lat, max_lat, -180.0, 180.0
    return min_lat, max_lat, min_lon, max_lon


class GeoBlocks:
    """Morton-sorted point store with a per-block min-max directory —
    the columnar 2-D BKD equivalent (see module docstring).

    Build once per segment/partition (cheap: one sort), query many
    times.  All arrays are plain numpy and memmap-friendly; at scale the
    four directory arrays are ~``n / block_size`` entries, resident,
    while the point arrays page in only for surviving blocks.
    """

    def __init__(
        self,
        lat_enc: np.ndarray,
        lon_enc: np.ndarray,
        ids: np.ndarray,
        block_size: int = 4096,
        presorted: bool = False,
        directory: np.ndarray = None,
    ):
        """``presorted=True``: arrays are already in morton order (an
        index-resident sidecar — ``build_geo_files``); with ``directory``
        (the stored ``(4, n_blocks)`` min-max array) construction touches
        NO point pages, so a memmapped segment sidecar opens lazily."""
        if presorted:
            self.lat, self.lon, self.ids = lat_enc, lon_enc, ids
        else:
            order = np.argsort(
                morton_interleave(lat_enc, lon_enc), kind="stable"
            )
            self.lat = lat_enc[order].astype(np.int32)
            self.lon = lon_enc[order].astype(np.int32)
            self.ids = ids[order]
        self.block_size = block_size
        n = len(self.ids)
        nb = -(-n // block_size)  # 0 blocks when empty
        if directory is not None:
            d = directory.reshape(4, nb)
            self.blk_lat_min, self.blk_lat_max = d[0], d[1]
            self.blk_lon_min, self.blk_lon_max = d[2], d[3]
            return
        if nb == 0:
            z = np.empty(0, np.int32)
            self.blk_lat_min = self.blk_lat_max = z
            self.blk_lon_min = self.blk_lon_max = z
            return
        pad = nb * block_size - n
        if pad:
            la = np.concatenate([self.lat, np.repeat(self.lat[-1:], pad)])
            lo = np.concatenate([self.lon, np.repeat(self.lon[-1:], pad)])
        else:
            la, lo = self.lat, self.lon
        la = la.reshape(nb, block_size)
        lo = lo.reshape(nb, block_size)
        self.blk_lat_min = la.min(axis=1)
        self.blk_lat_max = la.max(axis=1)
        self.blk_lon_min = lo.min(axis=1)
        self.blk_lon_max = lo.max(axis=1)

    def directory_bytes(self) -> bytes:
        """The ``(4, n_blocks)`` int32 min-max directory, serialized —
        the BKD inner-node role, stored so a reader never scans points."""
        return np.stack(
            [
                self.blk_lat_min,
                self.blk_lat_max,
                self.blk_lon_min,
                self.blk_lon_max,
            ]
        ).astype(np.int32).tobytes()

    def _candidate_mask(
        self, lat_lo: int, lat_hi: int, lon_lo: int, lon_hi: int
    ) -> np.ndarray:
        """Point-level mask limited to blocks overlapping the box."""
        hit = (
            (self.blk_lat_min <= lat_hi)
            & (self.blk_lat_max >= lat_lo)
            & (self.blk_lon_min <= lon_hi)
            & (self.blk_lon_max >= lon_lo)
        )
        n = len(self.ids)
        mask = np.zeros(n, dtype=bool)
        for b in np.flatnonzero(hit):  # touched blocks only
            s = b * self.block_size
            e = min(s + self.block_size, n)
            la = self.lat[s:e]
            lo = self.lon[s:e]
            mask[s:e] = (
                (la >= lat_lo)
                & (la <= lat_hi)
                & (lo >= lon_lo)
                & (lo <= lon_hi)
            )
        return mask

    def box(
        self,
        min_lat: float,
        max_lat: float,
        min_lon: float,
        max_lon: float,
    ) -> np.ndarray:
        """ids inside the degree box (inclusive bounds, matching
        ``LatLonPoint.newBoxQuery``: a point equal to an edge matches
        when its quantized code falls inside the quantized box)."""
        m = self._candidate_mask(
            int(encode_latitude(min_lat)),
            int(encode_latitude(max_lat)),
            int(encode_longitude(min_lon)),
            int(encode_longitude(max_lon)),
        )
        return self.ids[m]

    def distance(
        self, lat: float, lon: float, radius_m: float
    ) -> np.ndarray:
        """ids with haversine distance <= radius_m
        (``LatLonPointDistanceQuery`` semantics: bbox prune + exact
        refine on the DECODED quantized coordinates)."""
        b0, b1, b2, b3 = circle_to_bbox(lat, lon, radius_m)
        m = self._candidate_mask(
            int(encode_latitude(b0)),
            int(encode_latitude(b1)),
            int(encode_longitude(b2)),
            int(encode_longitude(b3)),
        )
        cand = np.flatnonzero(m)
        d = haversin_meters(
            decode_latitude(self.lat[cand]),
            decode_longitude(self.lon[cand]),
            lat,
            lon,
        )
        return self.ids[cand[d <= radius_m]]


GEO_BLOCK_SIZE = 4096


def build_geo_files(dv_table, geo_cols):
    """Per-segment geo-point sidecars from doc-values lat/lon degree
    columns — the ``LatLonPoint`` write role (quantize → 2-D organize,
    ``core/document/LatLonPoint.java`` + ``core/util/bkd/BKDWriter.java``;
    here morton sort + stored block directory, see module docstring).

    ``geo_cols``: ``((field, lat_col, lon_col), ...)``. Docs where either
    coordinate is null are absent from the sidecar (Lucene: a doc with no
    point for the field never matches a point query).

    → ``{field: (files: {suffix: bytes}, info: dict)}`` with suffixes
    ``lat`` / ``lon`` (int32, morton order), ``docs`` (uint32 local
    docids), ``dir`` ((4, n_blocks) int32 min-max directory)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = {}
    for field, lat_col, lon_col in geo_cols:
        la_col = dv_table.column(lat_col)
        lo_col = dv_table.column(lon_col)
        if isinstance(la_col, pa.ChunkedArray):
            la_col = la_col.combine_chunks()
        if isinstance(lo_col, pa.ChunkedArray):
            lo_col = lo_col.combine_chunks()
        valid = np.asarray(pc.is_valid(la_col)) & np.asarray(
            pc.is_valid(lo_col)
        )
        docs = np.flatnonzero(valid).astype(np.uint32)
        la = encode_latitude(
            np.asarray(la_col.cast(pa.float64()), dtype=np.float64)[valid]
        )
        lo = encode_longitude(
            np.asarray(lo_col.cast(pa.float64()), dtype=np.float64)[valid]
        )
        gb = GeoBlocks(la, lo, docs, block_size=GEO_BLOCK_SIZE)
        files = {
            "lat": gb.lat.astype(np.int32).tobytes(),
            "lon": gb.lon.astype(np.int32).tobytes(),
            "docs": gb.ids.astype(np.uint32).tobytes(),
            "dir": gb.directory_bytes(),
        }
        info = {
            "n": int(len(docs)),
            "block_size": GEO_BLOCK_SIZE,
            "lat_col": lat_col,
            "lon_col": lon_col,
        }
        out[field] = (files, info)
    return out
