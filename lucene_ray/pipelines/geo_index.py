"""Shared committed-index builder for the geo / range-field gate
pipelines.

The synthetic corpus has no coordinate or interval columns, so a
DERIVED copy of the documents table is materialized once per sf_dir
(doc_id, text, lat, lon, lo, hi — the deterministic scatter/arithmetic
the SQL oracles replicate), and ONE index is built over it with
``IndexConfig.geo_cols`` + ``range_cols`` sidecars.  Every geo / range
query then runs against the committed segments the way a reference user
queries a committed ``LatLonPoint`` / ``IntRange`` index — no per-batch
structure rebuilds.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.index.config import IndexConfig
from lucene_ray.pipelines.index_cache import CACHE_ROOT, get_or_build_index

# geo scatter constants (shared with pipelines/geo.py oracles)
PHI1 = 0.6180339887498949  # 1/phi
PHI2 = 0.7548776662466927  # plastic-number conjugate (independent scatter)

GEO_CONFIG = IndexConfig(
    rows_per_segment=2048,
    num_buckets=2,
    dv_cols=("lat", "lon", "lo", "hi"),
    geo_cols=(("loc", "lat", "lon"),),
    range_cols=(("iv", "lo", "hi"),),
)


def derive_raw_latlon(ids: np.ndarray):
    """doc_id → raw (lat, lon) degrees (pre-quantization): golden-ratio
    low-discrepancy scatter, pure float64 IEEE arithmetic."""
    d = ids.astype(np.float64)
    x = d * PHI1
    raw_lat = (x - np.floor(x)) * 180.0 - 90.0
    y = d * PHI2
    raw_lon = (y - np.floor(y)) * 360.0 - 180.0
    return raw_lat, raw_lon


def derive_interval(ids: np.ndarray):
    """doc_id → (lo, hi) interval (pure integer arithmetic)."""
    lo = (ids * 37) % 1000
    hi = lo + 1 + (ids * 13) % 120
    return lo, hi


def _derived_parquet(sf_dir: str) -> str:
    """Gate-scale convenience: the derivation runs on the driver over
    the small test table. At 100 TB the identical derivation is a
    ``map_batches`` ``add_column`` stage writing partitioned parquet
    (pure per-row arithmetic, no shuffle); only this materialization
    point changes, the index build consumes parquet either way."""
    docs = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha1(
        f"geo_derived:{os.path.abspath(docs)}:{os.path.getmtime(docs)}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(CACHE_ROOT, "derived", tag)
    out = os.path.join(out_dir, "documents_geo.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(docs, columns=["doc_id", "text"])
    ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
    lat, lon = derive_raw_latlon(ids)
    lo, hi = derive_interval(ids)
    tbl = tbl.append_column("lat", pa.array(lat, pa.float64()))
    tbl = tbl.append_column("lon", pa.array(lon, pa.float64()))
    tbl = tbl.append_column("lo", pa.array(lo, pa.int64()))
    tbl = tbl.append_column("hi", pa.array(hi, pa.int64()))
    tmp = out + f".tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out)
    return out_dir

def get_or_build_geo_index(sf_dir: str) -> str:
    """→ committed index dir with geo + range sidecars (build-once)."""
    return get_or_build_index(
        _derived_parquet(sf_dir), GEO_CONFIG, table="documents_geo"
    )
