"""1-D point index for numeric doc-values fields — the ``LongPoint`` /
BKD role (``core/document/LongPoint.java``, ``core/util/bkd/BKDWriter.java``,
``core/search/PointRangeQuery.java``).

Lucene indexes numeric fields in a BKD tree so a range query visits only
the leaf blocks overlapping ``[lo, hi]`` instead of scanning every doc.
For one dimension the BKD tree degenerates to *sorted leaves + a block
directory*, and the optimal columnar equivalent is simply the fully
sorted ``(value, docid)`` permutation of the column: a range query is
two binary searches (O(log n) touched pages via ``np.memmap``) plus a
slice of exactly the matching docids — never an O(maxDoc) column scan.

Layout per segment and field ``f`` (written by ``write_segment`` /
rebuilt by merge finalize, crc-checked like every segment file):

- ``points_<f>.vals.bin`` — int64 | float64, ascending (nulls excluded)
- ``points_<f>.docs.bin`` — uint32 local docids, aligned with vals
- segment meta ``points[f] = {"n": int, "kind": "i64"|"f64",
  "type": str(arrow type)}``

Results are IDENTICAL to the doc-values scan (``_eval_range``'s
pyarrow-compute path) — property-tested in ``tests/test_points.py``;
the searcher falls back to the scan whenever a query bound cannot be
normalized to the stored representation.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "build_point_files",
    "normalize_bound",
    "point_range_docids",
]


def _kind_of(t: pa.DataType) -> Tuple[str, pa.DataType, np.dtype]:
    """→ (kind, cast-target arrow type, numpy dtype) for a supported
    numeric DV type; raises for unsupported (string etc.) types."""
    if pa.types.is_timestamp(t) or pa.types.is_integer(t):
        return "i64", pa.int64(), np.dtype(np.int64)
    if pa.types.is_floating(t):
        return "f64", pa.float64(), np.dtype(np.float64)
    raise ValueError(f"point index unsupported for dv type {t}")


def build_point_files(
    dv_table: pa.Table, point_cols
) -> Dict[str, Tuple[bytes, bytes, dict]]:
    """Build the sorted (vals, docids) pair for each point column of a
    row-aligned doc-values table. Stable sort: equal values keep docid
    order, so the layout is deterministic for a given dv table."""
    out: Dict[str, Tuple[bytes, bytes, dict]] = {}
    for f in point_cols:
        col = dv_table.column(f)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        kind, pa_target, np_dtype = _kind_of(col.type)
        valid = np.asarray(pc.is_valid(col))
        docids = np.flatnonzero(valid).astype(np.uint32)
        vals = np.asarray(
            col.filter(pa.array(valid)).cast(pa_target), dtype=np_dtype
        )
        order = np.argsort(vals, kind="stable")
        info = {"n": int(len(vals)), "kind": kind, "type": str(col.type)}
        out[f] = (vals[order].tobytes(), docids[order].tobytes(), info)
    return out


_SENTINEL = object()


def normalize_bound(x, info: dict):
    """Convert a query bound to the stored representation, mirroring what
    pyarrow's compare kernels do on the scan path. Returns ``_SENTINEL``
    when the bound can't be normalized (caller falls back to the scan)."""
    if x is None:
        return None
    try:
        if info["kind"] == "f64":
            return float(x)
        if isinstance(x, (bool,)):
            return _SENTINEL
        if isinstance(x, (int, np.integer)):
            return int(x)
        t = info.get("type", "")
        if t.startswith("timestamp"):
            # timestamp[us] / [ns] / ... → raw ticks in the stored unit
            unit = t.split("[", 1)[1].split(",")[0].rstrip("]")
            return int(np.datetime64(x, unit).astype(np.int64))
        if isinstance(x, (float, np.floating)) and float(x).is_integer():
            return int(x)  # integral float bound on int col: exact
        # non-integral float vs int column has ceil/floor semantics that
        # depend on which bound it is — leave that to the scan path
        return _SENTINEL
    except Exception:
        return _SENTINEL


def point_range_docids(
    vals: np.ndarray,
    docs: np.ndarray,
    lo,
    hi,
    include_lo: bool,
    include_hi: bool,
    info: dict,
) -> Optional[np.ndarray]:
    """Range → sorted uint32 docids via two binary searches; None means
    "not answerable here, use the scan path"."""
    nlo = normalize_bound(lo, info)
    nhi = normalize_bound(hi, info)
    if nlo is _SENTINEL or nhi is _SENTINEL:
        return None
    start = (
        0
        if nlo is None
        else int(np.searchsorted(vals, nlo, "left" if include_lo else "right"))
    )
    end = (
        len(vals)
        if nhi is None
        else int(np.searchsorted(vals, nhi, "right" if include_hi else "left"))
    )
    if end <= start:
        return np.empty(0, dtype=np.uint32)
    return np.sort(docs[start:end])
