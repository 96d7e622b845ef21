"""Temporal merge policy — time-window-bucketed compaction for
time-series corpora, the role of the fork's ``TemporalMergePolicy``
(``core/index/TemporalMergePolicy.java:36-97,783-930``).

Segments are assigned to time windows by the MAX timestamp of a numeric
doc-values column. Recent data lands in small windows (``base_time``),
older data in exponentially larger ones (``base_time * min_threshold^k``,
capped at ``max_window_size``); segments in different windows are never
merged, preserving temporal locality for time-range queries. Data older
than ``max_age_seconds`` falls into a sentinel "cold" bucket that is
never compacted (no I/O on cold data).

Ray-native specifics of this engine:

- Timestamp ranges come from the segment's ``dv.parquet`` FOOTER
  statistics (row-group min/max) — no data pages are read, mirroring the
  reference's read of point-tree metadata rather than documents
  (``TemporalMergePolicy.java:617-700``). Tests can inject ranges via
  ``range_overrides`` (the ``segmentDateRangeOverrides`` hook).
- Within a window, merges are planned over CONTIGUOUS runs in docid-base
  order (this engine's global-docid tie-break contract; documented
  engine-wide constraint, rank-neutral). The reference instead orders by
  recency inside a window — for time-ordered ingestion the two coincide.
- Execution reuses ``merge_round``'s (merge × bucket) Ray task fan-out;
  the policy is pure planning over the manifest.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

OLD_DATA_BUCKET = -1


def _to_seconds(v: float) -> int:
    """Timestamp unit auto-detection by magnitude (seconds / millis /
    micros), per ``TemporalMergePolicy.setTemporalField`` docs."""
    v = float(v)
    if v >= 1e14:  # microseconds
        return int(v // 1_000_000)
    if v >= 1e11:  # milliseconds
        return int(v // 1_000)
    return int(v)


def segment_ts_range(seg_dir: str, fieldname: str) -> Optional[Tuple[int, int]]:
    """(min, max) SECONDS of a numeric dv column, from parquet footer
    stats only (falls back to a column read when stats are absent)."""
    import pyarrow.parquet as pq

    path = os.path.join(seg_dir, "dv.parquet")
    if not os.path.exists(path):
        return None
    pf = pq.ParquetFile(path)
    if fieldname not in pf.schema_arrow.names:
        return None
    ci = pf.schema_arrow.names.index(fieldname)
    md = pf.metadata
    mins: List[float] = []
    maxs: List[float] = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            mins = maxs = []
            break
        mins.append(float(st.min))
        maxs.append(float(st.max))
    if not mins:
        col = pq.read_table(path, columns=[fieldname]).column(fieldname)
        if len(col) == 0:
            return None
        import pyarrow.compute as pc

        mins = [pc.min(col).as_py()]
        maxs = [pc.max(col).as_py()]
        if mins[0] is None:
            return None
    return _to_seconds(min(mins)), _to_seconds(max(maxs))


@dataclass
class TemporalMergePolicy:
    """Plans merges for ``merge_round`` (same ``find_merges`` protocol as
    ``TieredMergePolicy``). Defaults follow the reference
    (``TemporalMergePolicy.java:100-110``)."""

    temporal_field: str
    base_time_seconds: int = 3600
    min_threshold: int = 4
    max_threshold: int = 8
    compaction_ratio: float = 1.2
    use_exponential_buckets: bool = True
    max_window_size_seconds: int = 365 * 86_400
    max_age_seconds: Optional[int] = None  # None = no cold cutoff
    now_seconds: Optional[int] = None  # pin for determinism (tests/bench)
    index_dir: str = ""  # bound by temporal_merge_round
    # test hook (segmentDateRangeOverrides): seg_id -> (min_s, max_s)
    range_overrides: Optional[Dict[int, Tuple[int, int]]] = field(default=None)

    def __post_init__(self):
        if not self.temporal_field:
            raise ValueError("temporal_field cannot be blank")
        if self.base_time_seconds <= 0:
            raise ValueError("base_time_seconds must be positive")
        if self.max_threshold < self.min_threshold:
            raise ValueError("max_threshold must be >= min_threshold")

    # -- bucketing (getBucketForTimestamp) ---------------------------------

    def bucket_for(self, ts_seconds: int, now_seconds: int) -> int:
        age = max(0, now_seconds - ts_seconds)  # future ts → newest bucket
        if self.max_age_seconds is not None and age > self.max_age_seconds:
            return OLD_DATA_BUCKET
        if not self.use_exponential_buckets:
            return (ts_seconds // self.base_time_seconds) * self.base_time_seconds
        size = self.base_time_seconds
        while (
            age >= size * self.min_threshold
            and size < self.max_window_size_seconds
        ):
            size *= self.min_threshold
        size = min(size, self.max_window_size_seconds)
        return (ts_seconds // size) * size

    # -- range resolution --------------------------------------------------

    def _ts_range(self, seg: dict) -> Optional[Tuple[int, int]]:
        if self.range_overrides is not None:
            return self.range_overrides.get(seg["seg_id"])
        from lucene_ray.index.manifest import segment_dir

        sdir = seg.get("dir") or segment_dir(self.index_dir, seg["seg_id"])
        return segment_ts_range(sdir, self.temporal_field)

    # -- planning (findMerges + planWindowMerges) --------------------------

    def find_merges(self, segments: List[dict]) -> List[List[int]]:
        now = (
            self.now_seconds
            if self.now_seconds is not None
            else int(time.time())
        )
        segs = sorted(segments, key=lambda s: s["base_docid"])
        buckets: Dict[int, List[int]] = {}  # bucket -> global positions
        for pos, s in enumerate(segs):
            rng = self._ts_range(s)
            if rng is None:
                continue  # no timestamp info — never merged by this policy
            buckets.setdefault(self.bucket_for(rng[1], now), []).append(pos)

        merges: List[List[int]] = []
        for bucket in sorted(buckets):
            if bucket == OLD_DATA_BUCKET:
                continue  # cold data is never compacted
            positions = buckets[bucket]
            if len(positions) < self.min_threshold:
                continue
            # contiguous runs in docid-base order (engine constraint)
            runs: List[List[int]] = [[positions[0]]]
            for p in positions[1:]:
                if p == runs[-1][-1] + 1:
                    runs[-1].append(p)
                else:
                    runs.append([p])
            for run in runs:
                run_segs = [segs[p] for p in run]
                for batch in self._plan_window(run_segs):
                    merges.append([run_segs[i]["seg_id"] for i in batch])
        return merges

    def _plan_window(self, window: List[dict]) -> List[List[int]]:
        """Greedy cursor batching with the compaction-ratio gate
        (``planWindowMerges``): emit a merge once the batch has at least
        ``min_threshold`` segments AND (aggressive mode ratio<=1: hits
        ``max_threshold`` or exhausts the window; normal mode: total docs
        >= ceil(largest * ratio) or hits ``max_threshold``)."""
        import math

        planned: List[List[int]] = []
        cursor = 0
        n = len(window)
        while n - cursor >= self.min_threshold:
            total = 0
            largest = 0
            end = cursor
            emitted = False
            while end < n and end - cursor < self.max_threshold:
                docs = int(window[end]["n_docs"])
                total += docs
                largest = max(largest, docs)
                end += 1
                size = end - cursor
                if size < self.min_threshold:
                    continue
                reached_max = size == self.max_threshold
                exhausted = end == n
                if self.compaction_ratio <= 1.0:
                    fire = reached_max or exhausted
                else:
                    fire = (
                        total >= math.ceil(largest * self.compaction_ratio)
                        or reached_max
                    )
                if fire:
                    planned.append(list(range(cursor, end)))
                    cursor = end
                    emitted = True
                    break
            if not emitted:
                break
        return planned


def temporal_merge_round(index_dir: str, policy: TemporalMergePolicy):
    """One temporal merge round: bind the policy to the index, plan on
    the manifest, execute via ``merge_round``'s Ray fan-out. Call
    repeatedly until no merges are planned."""
    from lucene_ray.index.merge import merge_round

    policy.index_dir = index_dir
    return merge_round(index_dir, policy)
