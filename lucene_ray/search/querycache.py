"""LRU query cache — per-(query, segment) match-set caching for
constant-score clauses, the role of ``LRUQueryCache``
(``lucene/core/src/java/org/apache/lucene/search/LRUQueryCache.java:61-120``).

What gets cached mirrors the reference's ``UsageTrackingQueryCachingPolicy``
intuition (cheap to reuse, expensive to recompute): doc-values range
filters and dictionary-expanding multi-term queries (prefix / wildcard /
fuzzy), whose evaluation cost is dominated by term-dict scans and dv
column compares, and whose results are constant-score docid sets.
Scoring term queries are NOT cached (scores are cheap to recompute and
caching them defeats pruning).

Policy knobs follow the reference's defaults scaled to this engine:
``max_entries`` bounds the number of cached (query, segment) sets and
``min_segment_docs`` skips tiny segments where recomputation is cheaper
than cache bookkeeping (``LRUQueryCache.java`` skips leaves < 10k docs /
3% of the index). Segments are immutable, so entries never go stale;
deletes are applied AFTER cache lookup (live-docs filtering happens at
collection, like the reference — the cache stores the raw match set).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional, Tuple

import numpy as np


class LRUQueryCache:
    def __init__(self, max_entries: int = 1000, min_segment_docs: int = 10_000):
        self.max_entries = max_entries
        self.min_segment_docs = min_segment_docs
        self._data: "OrderedDict[Tuple[str, str], np.ndarray]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def cache_key(query) -> str:
        """Stable identity of a constant-score query plan — dataclass
        repr is deterministic over field values (Query.equals/hashCode
        role)."""
        return repr(query)

    def get(self, query, seg) -> Optional[np.ndarray]:
        if seg.n_docs < self.min_segment_docs:
            return None
        key = (self.cache_key(query), seg.seg_dir)
        hit = self._data.get(key)
        if hit is None:
            self.misses += 1
            return None
        self._data.move_to_end(key)
        self.hits += 1
        return hit

    def put(self, query, seg, docids: np.ndarray) -> None:
        if seg.n_docs < self.min_segment_docs:
            return
        key = (self.cache_key(query), seg.seg_dir)
        self._data[key] = docids
        self._data.move_to_end(key)
        while len(self._data) > self.max_entries:
            self._data.popitem(last=False)  # evict LRU

    def __len__(self) -> int:
        return len(self._data)
