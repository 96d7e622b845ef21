"""1-D range-field index — the ``IntRange`` / ``LongRange`` document
type as a segment-resident sidecar.

Reference semantics: ``core/document/IntRange.java`` (a field storing a
``[min, max]`` interval per doc, encoded as a 2*dim point) and
``core/search/RangeFieldQuery.java:60-114`` (QueryType INTERSECTS /
WITHIN / CONTAINS / CROSSES, each a relation test between the doc
interval and the query interval, pruned by BKD inner-node min/max).

Columnar equivalent: sort the segment's intervals by ``lo`` (stable, so
ties keep docid order) and store the aligned ``(lo, hi, docid)`` arrays
plus a per-block ``(hi_min, hi_max)`` directory.  Every relation's
``lo`` constraint is then a *binary-search slice* of the sorted ``lo``
array (never an O(maxDoc) scan), and the ``hi`` constraint scans only
the blocks whose stored hi min/max can satisfy it — the same
leaf-pruning effect as the reference's 2-dim BKD visit, with plain
vectorized kernels.  Results are IDENTICAL to a full scan
(property-tested in ``tests/test_range_index.py``).

All four relations evaluate inside the INTERSECTS slice (``lo <= b``):
WITHIN (``lo >= a and hi <= b``) and CONTAINS (``lo <= a and hi >= b``)
are both subsets of INTERSECTS because a doc interval has ``lo <= hi``.
"""
from __future__ import annotations

import numpy as np

__all__ = ["RANGE_BLOCK_SIZE", "RangeBlocks", "build_range_files"]

RANGE_BLOCK_SIZE = 8192
RELATIONS = ("intersects", "within", "contains", "crosses")


class RangeBlocks:
    """lo-sorted interval store with a per-block hi min-max directory."""

    def __init__(
        self,
        lo: np.ndarray,
        hi: np.ndarray,
        ids: np.ndarray,
        block_size: int = RANGE_BLOCK_SIZE,
        presorted: bool = False,
        directory: np.ndarray = None,
    ):
        if presorted:
            self.lo, self.hi, self.ids = lo, hi, ids
        else:
            order = np.argsort(lo, kind="stable")
            self.lo = np.asarray(lo)[order]
            self.hi = np.asarray(hi)[order]
            self.ids = np.asarray(ids)[order]
        self.block_size = block_size
        n = len(self.ids)
        nb = -(-n // block_size)
        if directory is not None:
            d = directory.reshape(2, nb)
            self.blk_hi_min, self.blk_hi_max = d[0], d[1]
            return
        if nb == 0:
            z = np.empty(0, np.int64)
            self.blk_hi_min = self.blk_hi_max = z
            return
        pad = nb * block_size - n
        h = (
            np.concatenate([self.hi, np.repeat(self.hi[-1:], pad)])
            if pad
            else self.hi
        ).reshape(nb, block_size)
        self.blk_hi_min = h.min(axis=1)
        self.blk_hi_max = h.max(axis=1)

    def directory_bytes(self) -> bytes:
        return (
            np.stack([self.blk_hi_min, self.blk_hi_max])
            .astype(np.int64)
            .tobytes()
        )

    def _refine(self, end: int, need) -> np.ndarray:
        """Positions in ``[0, end)`` satisfying the hi predicate, visiting
        only blocks the directory can't rule out.  ``need`` is
        ``("ge"|"le", bound)`` or None (every position matches)."""
        if end <= 0:
            return np.empty(0, np.int64)
        if need is None:
            return np.arange(end, dtype=np.int64)
        op, bound = need
        nb_touched = -(-end // self.block_size)
        bmin = self.blk_hi_min[:nb_touched]
        bmax = self.blk_hi_max[:nb_touched]
        if op == "ge":
            blocks = np.flatnonzero(bmax >= bound)
        else:
            blocks = np.flatnonzero(bmin <= bound)
        out = []
        for b in blocks:
            s = b * self.block_size
            e = min(s + self.block_size, end)
            h = self.hi[s:e]
            m = (h >= bound) if op == "ge" else (h <= bound)
            hit = np.flatnonzero(m)
            if len(hit):
                out.append(hit + s)
        if not out:
            return np.empty(0, np.int64)
        return np.concatenate(out)

    def relate(self, relation: str, a, b) -> np.ndarray:
        """docids whose interval has the given relation to ``[a, b]``
        (``RangeFieldQuery.QueryType`` semantics, inclusive bounds)."""
        n = len(self.ids)
        # INTERSECTS slice: lo <= b (prefix of the sorted lo array)
        i_end = int(np.searchsorted(self.lo, b, "right"))
        if relation == "intersects":
            pos = self._refine(i_end, ("ge", a))
        elif relation == "within":
            # lo >= a: drop the sorted-lo prefix below a, then hi <= b
            start = int(np.searchsorted(self.lo, a, "left"))
            pos = self._refine(i_end, ("le", b))
            pos = pos[pos >= start]
        elif relation == "contains":
            # lo <= a (a <= b makes this a sub-prefix) and hi >= b
            c_end = int(np.searchsorted(self.lo, a, "right"))
            pos = self._refine(min(c_end, i_end), ("ge", b))
        elif relation == "crosses":
            inter = self._refine(i_end, ("ge", a))
            lo_v = self.lo[inter]
            hi_v = self.hi[inter]
            within = (lo_v >= a) & (hi_v <= b)
            contains = (lo_v <= a) & (hi_v >= b)
            pos = inter[~within & ~contains]
        else:
            raise ValueError(
                f"relation must be one of {RELATIONS}, got {relation!r}"
            )
        del n
        return np.sort(np.asarray(self.ids[pos]))


def build_range_files(dv_table, range_cols):
    """Per-segment range-field sidecars from doc-values lo/hi integer
    columns — ``((field, lo_col, hi_col), ...)``. Docs where either bound
    is null carry no interval and never match.  → ``{field: (files:
    {suffix: bytes}, info)}`` with suffixes ``lo`` / ``hi`` (int64, sorted
    by lo), ``docs`` (uint32), ``dir`` ((2, n_blocks) int64)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = {}
    for field, lo_col, hi_col in range_cols:
        lo_c = dv_table.column(lo_col)
        hi_c = dv_table.column(hi_col)
        if isinstance(lo_c, pa.ChunkedArray):
            lo_c = lo_c.combine_chunks()
        if isinstance(hi_c, pa.ChunkedArray):
            hi_c = hi_c.combine_chunks()
        valid = np.asarray(pc.is_valid(lo_c)) & np.asarray(
            pc.is_valid(hi_c)
        )
        docs = np.flatnonzero(valid).astype(np.uint32)
        lo = np.asarray(lo_c.cast(pa.int64()), dtype=np.int64)[valid]
        hi = np.asarray(hi_c.cast(pa.int64()), dtype=np.int64)[valid]
        if (hi < lo).any():
            raise ValueError(
                f"range field {field!r}: {int((hi < lo).sum())} docs have "
                f"{hi_col} < {lo_col} (an interval needs lo <= hi)"
            )
        rb = RangeBlocks(lo, hi, docs, block_size=RANGE_BLOCK_SIZE)
        files = {
            "lo": rb.lo.astype(np.int64).tobytes(),
            "hi": rb.hi.astype(np.int64).tobytes(),
            "docs": rb.ids.astype(np.uint32).tobytes(),
            "dir": rb.directory_bytes(),
        }
        info = {
            "n": int(len(docs)),
            "block_size": RANGE_BLOCK_SIZE,
            "lo_col": lo_col,
            "hi_col": hi_col,
        }
        out[field] = (files, info)
    return out
