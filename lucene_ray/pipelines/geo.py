"""Geo point queries over the documents table — the ``LatLonPoint``
search surface (``core/document/LatLonPoint.java`` box/distance query
factories) against a COMMITTED index.

The synthetic corpus has no coordinate columns, so each doc gets a
DETERMINISTIC position derived from ``doc_id`` by golden-ratio
low-discrepancy scatter — pure float64 IEEE arithmetic that a SQL
oracle reproduces bit-for-bit:

    raw_lat = frac(doc_id * PHI1) * 180 - 90
    raw_lon = frac(doc_id * PHI2) * 360 - 180

then round-tripped through the reference's int32 quantization
(`index/geo.py`: encode → decode), exactly as LatLonPoint stores and
query refinement sees them.

Index-resident path (round 5): ``pipelines/geo_index.py`` materializes
the derived (lat, lon) degree columns once per sf_dir and builds ONE
committed index with ``IndexConfig.geo_cols`` — each segment carries a
morton-sorted point sidecar + stored block min-max directory (the 2-D
BKD write role, ``core/util/bkd/BKDWriter.java``), rebuilt through
merges.  Queries stream through the searcher actor pool as
:class:`~lucene_ray.search.query.GeoBoxQuery` /
:class:`GeoDistanceQuery` nodes evaluated against those sidecars
(``LatLonPointDistanceQuery.java`` box-prune + haversine-refine
semantics) — no per-batch structure rebuilds anywhere.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.index.geo import (
    LATITUDE_DECODE,
    LONGITUDE_DECODE,
    decode_latitude,
    decode_longitude,
    encode_latitude,
    encode_longitude,
    haversin_meters,
)
from lucene_ray.pipelines.geo_index import (
    PHI1 as _PHI1,
    PHI2 as _PHI2,
    derive_raw_latlon,
    get_or_build_geo_index,
)
from lucene_ray.search.query import GeoBoxQuery, GeoDistanceQuery
from lucene_ray.search.searcher import search_dataset

# Fixed gate-query geometry (sf-independent).
BOX = (-35.0, 20.0, -60.0, 75.0)  # min_lat, max_lat, min_lon, max_lon
CENTER = (12.0, -7.0)
RADIUS_M = 3_200_000.0


def derive_latlon(ids: np.ndarray):
    """doc_id → (lat_enc int32, lon_enc int32): scatter then quantize."""
    raw_lat, raw_lon = derive_raw_latlon(ids)
    return encode_latitude(raw_lat), encode_longitude(raw_lon)


def geo_query_factory(spec: str):
    """Picklable query factory for the searcher actor pool: the query
    column carries ``"box"`` / ``"distance"``; geometry is the fixed
    gate constants."""
    if spec == "box":
        return GeoBoxQuery("loc", *BOX)
    if spec == "distance":
        return GeoDistanceQuery("loc", CENTER[0], CENTER[1], RADIUS_M)
    raise ValueError(f"unknown geo query spec {spec!r}")


def _emit_hits(b: pa.Table) -> pa.Table:
    """searcher hits → (doc_id, lat, lon): coordinates re-derive from
    doc_id (decoded quantized degrees), vectorized."""
    ids = np.asarray(b.column("key").cast(pa.int64()), dtype=np.int64)
    la, lo = derive_latlon(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lat": pa.array(decode_latitude(la), pa.float64()),
            "lon": pa.array(decode_longitude(lo), pa.float64()),
        }
    )


def _run(sf_dir: str, spec: str):
    import ray.data

    idx = get_or_build_geo_index(sf_dir)
    qds = ray.data.from_items([{"qid": 0, "query": spec, "k": 10**9}])
    res = search_dataset(idx, qds, query_factory=geo_query_factory)
    return res.map_batches(_emit_hits, batch_format="pyarrow").sort(
        "doc_id"
    )


def geo_box_search(sf_dir: str):
    """Docs whose quantized point lies in ``BOX`` → (doc_id, lat, lon)
    ordered by doc_id (``LatLonPoint.newBoxQuery`` semantics: integer
    compare on the quantized codes, inclusive edges), answered by the
    committed index's geo sidecars."""
    return _run(sf_dir, "box")


def geo_distance_search(sf_dir: str):
    """Docs within ``RADIUS_M`` haversine meters of ``CENTER`` →
    (doc_id, lat, lon) ordered by doc_id
    (``LatLonPoint.newDistanceQuery``: circle-bbox prune + exact refine
    on decoded coordinates), answered by the committed index."""
    return _run(sf_dir, "distance")


SORT_K = 25


def geo_distance_sort(sf_dir: str):
    """Top-``SORT_K`` docs NEAREST to ``CENTER`` — the
    ``LatLonDocValuesField.newDistanceSort`` role
    (``core/document/LatLonDocValuesField.java`` +
    ``core/search/comparators/`` distance comparator): exact haversine
    over the DECODED quantized coordinates, ascending, docid tie-break.

    Ray shape: one task per segment over the committed index's geo
    sidecar (all coordinates of a segment score in one vectorized
    haversine — the doc-values comparator's exhaustive leg), per-segment
    top-k, tiny driver merge. → (rank, doc_id, dist_cm) where dist_cm =
    floor(meters·100 + 0.5) (the ranking itself uses the full double)."""
    import ray

    from lucene_ray.index.manifest import load_manifest, segment_dir
    from lucene_ray.index.segment import SegmentReader
    from lucene_ray.pipelines.geo_index import get_or_build_geo_index

    idx = get_or_build_geo_index(sf_dir)
    man = load_manifest(idx)

    @ray.remote(num_cpus=1)
    def seg_task(sdir: str):
        seg = SegmentReader(sdir)
        gi = seg.geo_index("loc")
        d = haversin_meters(
            decode_latitude(np.asarray(gi.lat)),
            decode_longitude(np.asarray(gi.lon)),
            CENTER[0],
            CENTER[1],
        )
        keys = np.asarray(
            seg.docmap.take(pa.array(np.asarray(gi.ids, dtype=np.int64)))
        ).astype(np.int64)
        # rank on the centimeter quantization (ties → doc_id): sub-cm
        # distance differences must not decide order, or a last-ulp
        # double discrepancy between engines could flip ranks
        cm = np.floor(d * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((keys, cm))[:SORT_K]
        return cm[order], keys[order]

    futs = [
        seg_task.remote(
            s.get("dir") or segment_dir(idx, int(s["seg_id"]))
        )
        for s in man.segments
    ]
    parts = ray.get(futs)
    cm_all = np.concatenate([p[0] for p in parts])
    k_all = np.concatenate([p[1] for p in parts])
    order = np.lexsort((k_all, cm_all))[:SORT_K]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(k_all[order], pa.int64()),
            "dist_cm": pa.array(cm_all[order], pa.int64()),
        }
    )


def sql_geo_distance_sort() -> str:
    lat, lon = CENTER
    return f"""
with {_derive_cte()},
pts as (
  select doc_id,
         lat_enc * {LATITUDE_DECODE!r} as lat,
         lon_enc * {LONGITUDE_DECODE!r} as lon
  from base
),
d as (
  select doc_id,
         2.0 * 6371008.7714 * asin(sqrt(
           pow(sin((radians(lat) - radians({lat!r})) / 2), 2)
           + cos(radians({lat!r})) * cos(radians(lat))
             * pow(sin((radians(lon) - radians({lon!r})) / 2), 2)
         )) as dist
  from pts
),
r as (
  select doc_id, cast(floor(dist * 100.0 + 0.5) as bigint) as dist_cm,
         row_number() over (
           order by floor(dist * 100.0 + 0.5) asc, doc_id asc
         ) - 1 as rank
  from d
)
select cast(rank as bigint) as rank, doc_id, dist_cm
from r where rank < {SORT_K}
order by rank
"""


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
