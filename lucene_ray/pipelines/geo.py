"""Geo point queries over the documents table — the ``LatLonPoint``
search surface (``core/document/LatLonPoint.java`` box/distance query
factories) as Ray Data pipelines.

The synthetic corpus has no coordinate columns, so each doc gets a
DETERMINISTIC position derived from ``doc_id`` by golden-ratio
low-discrepancy scatter — pure float64 IEEE arithmetic that a SQL
oracle reproduces bit-for-bit:

    raw_lat = frac(doc_id * PHI1) * 180 - 90
    raw_lon = frac(doc_id * PHI2) * 360 - 180

then round-tripped through the reference's int32 quantization
(`index/geo.py`: encode → decode), exactly as LatLonPoint stores and
query refinement sees them.

Each query stage builds a :class:`~lucene_ray.index.geo.GeoBlocks`
(morton sort + block min-max directory — the 2-D BKD leaf-pruning
equivalent) over its batch and probes it; correctness is
scan-identical (property-tested), the structure is the 100-TB path: at
scale the blocks are built once per partition/segment and reused
across queries, and only boxes' overlapping blocks are ever touched.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.index.geo import (
    LATITUDE_DECODE,
    LONGITUDE_DECODE,
    GeoBlocks,
    decode_latitude,
    decode_longitude,
    encode_latitude,
    encode_longitude,
)

_PHI1 = 0.6180339887498949  # 1/phi
_PHI2 = 0.7548776662466927  # plastic-number conjugate (independent scatter)

# Fixed gate-query geometry (sf-independent).
BOX = (-35.0, 20.0, -60.0, 75.0)  # min_lat, max_lat, min_lon, max_lon
CENTER = (12.0, -7.0)
RADIUS_M = 3_200_000.0


def _docs_path(sf_dir: str) -> str:
    import os

    return os.path.join(sf_dir, "documents.parquet")


def derive_latlon(ids: np.ndarray):
    """doc_id → (lat_enc int32, lon_enc int32): scatter then quantize."""
    d = ids.astype(np.float64)
    x = d * _PHI1
    raw_lat = (x - np.floor(x)) * 180.0 - 90.0
    y = d * _PHI2
    raw_lon = (y - np.floor(y)) * 360.0 - 180.0
    return encode_latitude(raw_lat), encode_longitude(raw_lon)


def _emit(ids: np.ndarray, la: np.ndarray, lo: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lat": pa.array(decode_latitude(la), pa.float64()),
            "lon": pa.array(decode_longitude(lo), pa.float64()),
        }
    )


def geo_box_search(sf_dir: str):
    """Docs whose quantized point lies in ``BOX`` → (doc_id, lat, lon)
    ordered by doc_id (``LatLonPoint.newBoxQuery`` semantics: integer
    compare on the quantized codes, inclusive edges)."""
    import ray.data

    def stage(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        la, lo = derive_latlon(ids)
        gb = GeoBlocks(la, lo, np.arange(len(ids)))
        sel = np.sort(gb.box(*BOX))
        return _emit(ids[sel], la[sel], lo[sel])

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id"])
    return ds.map_batches(stage, batch_format="pyarrow").sort("doc_id")


def geo_distance_search(sf_dir: str):
    """Docs within ``RADIUS_M`` haversine meters of ``CENTER`` →
    (doc_id, lat, lon) ordered by doc_id
    (``LatLonPoint.newDistanceQuery``: circle-bbox prune + exact refine
    on decoded coordinates)."""
    import ray.data

    def stage(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        la, lo = derive_latlon(ids)
        gb = GeoBlocks(la, lo, np.arange(len(ids)))
        sel = np.sort(gb.distance(CENTER[0], CENTER[1], RADIUS_M))
        return _emit(ids[sel], la[sel], lo[sel])

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id"])
    return ds.map_batches(stage, batch_format="pyarrow").sort("doc_id")


# -- oracles ---------------------------------------------------------------


def _derive_cte() -> str:
    # floor(raw / DECODE) never reaches 2^31 here (raw < 90/180 strictly,
    # frac() < 1), so the encode clamp is a no-op and omitted in SQL.
    return f"""
base as (
  select doc_id,
         cast(floor(((doc_id * {_PHI1!r} - floor(doc_id * {_PHI1!r})) * 180 - 90)
              / {LATITUDE_DECODE!r}) as bigint) as lat_enc,
         cast(floor(((doc_id * {_PHI2!r} - floor(doc_id * {_PHI2!r})) * 360 - 180)
              / {LONGITUDE_DECODE!r}) as bigint) as lon_enc
  from documents
)
"""


def sql_geo_box_search() -> str:
    lat_lo = int(encode_latitude(BOX[0]))
    lat_hi = int(encode_latitude(BOX[1]))
    lon_lo = int(encode_longitude(BOX[2]))
    lon_hi = int(encode_longitude(BOX[3]))
    return f"""
with {_derive_cte()}
select doc_id,
       lat_enc * {LATITUDE_DECODE!r} as lat,
       lon_enc * {LONGITUDE_DECODE!r} as lon
from base
where lat_enc between {lat_lo} and {lat_hi}
  and lon_enc between {lon_lo} and {lon_hi}
order by doc_id
"""


def sql_geo_distance_search() -> str:
    lat, lon = CENTER
    return f"""
with {_derive_cte()},
pts as (
  select doc_id,
         lat_enc * {LATITUDE_DECODE!r} as lat,
         lon_enc * {LONGITUDE_DECODE!r} as lon
  from base
)
select doc_id, lat, lon from pts
where 2.0 * 6371008.7714 * asin(sqrt(
        pow(sin((radians(lat) - radians({lat!r})) / 2), 2)
        + cos(radians({lat!r})) * cos(radians(lat))
          * pow(sin((radians(lon) - radians({lon!r})) / 2), 2)
      )) <= {RADIUS_M!r}
order by doc_id
"""
