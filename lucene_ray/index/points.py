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
    "sorted_topk_candidates",
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
        if kind == "f64" and np.isnan(vals).any():
            # NaN breaks the total order binary search relies on, and the
            # scan path's NaN semantics (excluded by bounded comparisons,
            # included by the fully-open is_valid range) can't be
            # reproduced by a slice — skip the sidecar so every query
            # path keeps the scan semantics for this segment+field
            continue
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
        if isinstance(x, (bool, np.bool_)):
            # arrow compare kernels have no (numeric, bool) kernel — the
            # scan path raises, so the point path must not answer either
            return _SENTINEL
        if info["kind"] == "f64":
            if not isinstance(x, (int, float, np.integer, np.floating)):
                return _SENTINEL
            return float(x)
        t = info.get("type", "")
        if t.startswith("timestamp"):
            # datetime-like bounds only: arrow has no
            # (timestamp, int64) compare kernel, so a raw-number bound
            # must fall back to the scan path (which raises, identical
            # to a sidecar-less config)
            if not isinstance(x, np.datetime64) and not hasattr(
                x, "toordinal"
            ):
                return _SENTINEL
            unit = t.split("[", 1)[1].split(",")[0].rstrip("]")
            return int(np.datetime64(x, unit).astype(np.int64))
        if isinstance(x, (int, np.integer)):
            return int(x)
        if isinstance(x, (float, np.floating)) and float(x).is_integer():
            return int(x)  # integral float bound on int col: exact
        # non-integral float vs int column has ceil/floor semantics that
        # depend on which bound it is — leave that to the scan path
        return _SENTINEL
    except Exception:
        return _SENTINEL


def sorted_topk_candidates(
    vals: np.ndarray,
    docs: np.ndarray,
    match_sorted: np.ndarray,
    k: int,
    descending: bool,
    start_value=None,
    qualifier=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Walk the sorted point permutation from the competitive end and
    return a candidate pool GUARANTEED to contain the true top-k of the
    match set ordered by (value, docid asc) — the role of
    ``NumericComparator``'s point-based competitive iterator
    (``core/search/comparators/NumericComparator.java``): a sort over a
    big match set touches O(k * n/|matches|) permutation entries instead
    of gathering + sorting every match's doc value.

    Stops once >= k members are collected AND the next value to visit is
    strictly worse than the pool's k-th best (equal values must keep
    walking: ties break by docid, and equal-value runs are visited in
    docid order only within one run). Caller does the final
    (value, docid) sort over the small pool.

    ``start_value`` (searchAfter cursor support): skip straight past
    every entry strictly better than it — the walk seeks the cursor's
    value by binary search instead of visiting the already-served
    prefix. ``qualifier(vals, docs) -> bool mask`` additionally filters
    collected members (cursor tie semantics); only qualified members
    count toward k."""
    n = len(vals)
    out_v: List[np.ndarray] = []
    out_d: List[np.ndarray] = []
    count = 0
    kth = None  # cached pool k-th best (invalidated when members land)
    chunk = max(512, 4 * k)
    pos = n if descending else 0
    if start_value is not None:
        # seek: desc pages walk values <= cursor, asc pages values >=
        pos = int(
            np.searchsorted(vals, start_value, "right")
            if descending
            else np.searchsorted(vals, start_value, "left")
        )
    while (pos > 0) if descending else (pos < n):
        if descending:
            lo, hi = max(0, pos - chunk), pos
            pos = lo
        else:
            lo, hi = pos, min(n, pos + chunk)
            pos = hi
        cd = docs[lo:hi]
        cv = vals[lo:hi]
        idx = np.searchsorted(match_sorted, cd)
        safe = np.minimum(idx, len(match_sorted) - 1)
        member = (
            np.zeros(len(cd), dtype=bool)
            if len(match_sorted) == 0
            else match_sorted[safe] == cd
        )
        if qualifier is not None and member.any():
            member &= qualifier(cv, cd)
        if member.any():
            out_v.append(np.asarray(cv[member]))
            out_d.append(np.asarray(cd[member]))
            count += int(member.sum())
            kth = None  # pool changed → recompute at the next stop-check
        if count >= k:
            if kth is None:
                pool_v = np.concatenate(out_v)
                kth = (
                    -np.partition(-pool_v, k - 1)[k - 1]
                    if descending
                    else np.partition(pool_v, k - 1)[k - 1]
                )
            nxt = vals[pos - 1] if descending else (vals[pos] if pos < n else None)
            boundary_done = (
                pos == 0 if descending else pos >= n
            )
            if boundary_done or (kth > nxt if descending else kth < nxt):
                break
        chunk *= 2
    if not out_v:
        return np.empty(0, vals.dtype), np.empty(0, docs.dtype)
    return np.concatenate(out_v), np.concatenate(out_d)


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
