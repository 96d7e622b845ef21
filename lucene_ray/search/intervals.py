"""Minimal-interval proximity queries — the ``lucene/queries/intervals``
module (clean-room from its published semantics):

- ``IntervalQuery`` (``intervals/IntervalQuery.java:71-84``): score a doc
  by its minimal intervals' "sloppy freq" through a saturation function
  (default pivot 1).
- freq accumulation (``intervals/IntervalScorer.java:60-69``): per
  minimal interval, ``freq += 1 / max(length - minExtent + 1, 1)`` with
  ``length = end - start + 1`` — Java accumulates into a *float* field,
  reproduced here with per-add float32 narrowing.
- saturation score (``intervals/IntervalScoreFunction.java``):
  ``weight * (1 - pivot / (pivot + freq))`` in float32.
- sources (``intervals/Intervals.java``): term leaves composed by
  ``ordered`` (strictly increasing positions,
  ``OrderedIntervalsSource.java``) and ``unordered``
  (``UnorderedIntervalsSource.java``), filtered by ``maxgaps`` /
  ``maxwidth`` (``FilteredIntervalsSource.java``);
  ``minExtent`` = number of term leaves (``OrderedIntervalsSource.java:69-74``,
  ``TermIntervalsSource.java:229``).

Scope: one composition level (ordered/unordered over TERM leaves, then
any chain of maxgaps/maxwidth filters) — the subset expressible over
per-term position lists; nested positional sources are out of scope and
rejected at parse time. Minimality (no reported interval contains
another) follows Vigna's minimal-interval semantics, property-tested
against brute-force enumeration in ``tests/test_intervals.py``.

Source spec syntax (plain tuples — hashable, picklable):
    ("term", "t")
    ("ordered",  ("term","a"), ("term","b"), ...)
    ("unordered", ...)
    ("phrase", ("term","a"), ("term","b"), ...)   # BlockIntervalsSource
    ("maxgaps", g, inner)
    ("maxwidth", w, inner)
    ("or", inner1, inner2, ...)          # DisjunctionIntervalsSource
    ("containing", big, small)           # big intervals holding a small
    ("contained_by", small, big)         # small intervals inside a big
    ("not_containing", a, b)             # a's intervals free of any b
    ("not_contained_by", a, b)           # a's intervals outside every b
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

F32 = np.float32

Interval = Tuple[int, int]


def ordered_intervals(pls: Sequence[np.ndarray]) -> List[Interval]:
    """Minimal intervals containing one position of each term IN ORDER
    (strictly increasing). Starts strictly increase across the result,
    ends non-strictly — no interval nests inside another."""
    n = len(pls)
    if n == 1:
        return [(int(p), int(p)) for p in pls[0]]
    if any(len(l) == 0 for l in pls):
        return []
    idx = [0] * n
    out: List[Interval] = []
    while True:
        prev = -1
        for j in range(n):
            l = pls[j]
            i = idx[j]
            while i < len(l) and l[i] <= prev:
                i += 1
            if i == len(l):
                return out
            idx[j] = i
            prev = int(l[i])
        end = prev
        # maximize the start (and every inner slot) for this end, so the
        # reported interval is minimal
        for j in range(n - 2, -1, -1):
            l = pls[j]
            i = idx[j]
            nxt = int(pls[j + 1][idx[j + 1]])
            while i + 1 < len(l) and l[i + 1] < nxt:
                i += 1
            idx[j] = i
        out.append((int(pls[0][idx[0]]), end))
        idx[0] += 1


def unordered_intervals(pls: Sequence[np.ndarray]) -> List[Interval]:
    """Minimal windows containing one position of each term in any
    order. Token positions are unique within a doc (one token per
    position), so candidate starts strictly increase; the backward scan
    drops any window containing a later (smaller) one."""
    n = len(pls)
    if n == 1:
        return [(int(p), int(p)) for p in pls[0]]
    if any(len(l) == 0 for l in pls):
        return []
    idx = [0] * n
    cands: List[Interval] = []
    while True:
        cur = [int(pls[j][idx[j]]) for j in range(n)]
        s, e = min(cur), max(cur)
        cands.append((s, e))
        jmin = cur.index(s)
        idx[jmin] += 1
        if idx[jmin] == len(pls[jmin]):
            break
    out: List[Interval] = []
    best = None
    for s, e in reversed(cands):
        if best is None or e < best:
            out.append((s, e))
            best = e
    out.reverse()
    return out


def minimize(iv: List[Interval]) -> List[Interval]:
    """Drop every interval that contains another (minimal antichain) —
    the union step of ``DisjunctionIntervalsSource``. Input may hold
    duplicates from different children."""
    # (start asc, end desc) so the reversed scan sees, for equal starts,
    # the narrower interval first and drops the wider one
    uniq = sorted(set(iv), key=lambda t: (t[0], -t[1]))
    out: List[Interval] = []
    best = None
    for s, e in reversed(uniq):
        if best is None or e < best:
            out.append((s, e))
            best = e
    out.reverse()
    return out


def filter_maxgaps(iv: List[Interval], n_terms: int, g: int) -> List[Interval]:
    """Keep intervals with at most ``g`` gap positions
    (``Intervals.maxgaps``: gaps = length - minExtent)."""
    return [(s, e) for s, e in iv if (e - s + 1) - n_terms <= g]


def filter_maxwidth(iv: List[Interval], w: int) -> List[Interval]:
    return [(s, e) for s, e in iv if (e - s + 1) <= w]


def source_terms(spec: tuple) -> List[str]:
    """Flatten a source spec to its term leaves (validates the spec)."""
    kind = spec[0]
    if kind == "term":
        return [spec[1]]
    if kind in ("ordered", "unordered"):
        terms: List[str] = []
        for sub in spec[1:]:
            if sub[0] != "term":
                raise ValueError(
                    "ordered/unordered accept term leaves only "
                    f"(got nested {sub[0]!r})"
                )
            terms.append(sub[1])
        if len(set(terms)) != len(terms):
            # duplicate leaves would share one position list; Lucene
            # gives each duplicate its own iterator — out of scope
            raise ValueError("duplicate term leaves unsupported")
        return terms
    if kind == "phrase":
        return source_terms(("ordered",) + spec[1:])
    if kind in ("maxgaps", "maxwidth"):
        return source_terms(spec[2])
    if kind in ("or", "containing", "contained_by",
                "not_containing", "not_contained_by"):
        seen: List[str] = []
        for sub in spec[1:]:
            for t in source_terms(sub):
                if t not in seen:
                    seen.append(t)
        return seen
    raise ValueError(f"unknown interval source {kind!r}")


def required_terms(spec: tuple) -> List[str]:
    """Leaf terms a doc MUST contain to produce any interval (the
    candidate-pruning set): the searcher intersects these terms'
    postings; empty list = nothing provably required (an ``or`` at the
    top), so candidates fall back to the union of all leaves. For
    ``not_containing``/``not_contained_by`` only the minuend side is
    required — the subtracted side may be absent entirely."""
    kind = spec[0]
    if kind == "term":
        return [spec[1]]
    if kind in ("ordered", "unordered", "phrase"):
        return source_terms(spec)
    if kind in ("maxgaps", "maxwidth"):
        return required_terms(spec[2])
    if kind in ("containing", "contained_by"):
        out = list(required_terms(spec[1]))
        for t in required_terms(spec[2]):
            if t not in out:
                out.append(t)
        return out
    if kind in ("not_containing", "not_contained_by"):
        return required_terms(spec[1])
    if kind == "or":
        return []
    raise ValueError(f"unknown interval source {kind!r}")



def eval_source(spec: tuple, pls_by_term) -> Tuple[List[Interval], int]:
    """→ (minimal intervals, minExtent) for one doc's position lists
    (``pls_by_term``: term → sorted int positions array)."""
    kind = spec[0]
    if kind == "term":
        return [(int(p), int(p)) for p in pls_by_term[spec[1]]], 1
    if kind in ("ordered", "unordered"):
        terms = [sub[1] for sub in spec[1:]]
        pls = [pls_by_term[t] for t in terms]
        iv = (
            ordered_intervals(pls)
            if kind == "ordered"
            else unordered_intervals(pls)
        )
        return iv, len(terms)
    if kind == "phrase":
        # BlockIntervalsSource (Intervals.phrase): consecutive terms ==
        # ordered intervals of exactly minExtent width (zero gaps)
        iv, me = eval_source(("ordered",) + spec[1:], pls_by_term)
        return filter_maxgaps(iv, me, 0), me
    if kind == "maxgaps":
        iv, me = eval_source(spec[2], pls_by_term)
        return filter_maxgaps(iv, me, int(spec[1])), me
    if kind == "maxwidth":
        iv, me = eval_source(spec[2], pls_by_term)
        return filter_maxwidth(iv, int(spec[1])), me
    if kind == "or":
        # DisjunctionIntervalsSource: minimized union; minExtent = min
        # over children (DisjunctionIntervalsSource.minExtent)
        ivs: List[Interval] = []
        mes: List[int] = []
        for sub in spec[1:]:
            iv, me = eval_source(sub, pls_by_term)
            ivs.extend(iv)
            mes.append(me)
        return minimize(ivs), min(mes)
    if kind == "containing":
        # Intervals.containing(big, small): big's intervals that contain
        # at least one interval of small (ContainingIntervalsSource)
        big, bme = eval_source(spec[1], pls_by_term)
        small, _ = eval_source(spec[2], pls_by_term)
        return [
            (s, e)
            for s, e in big
            if any(s <= s2 and e2 <= e for s2, e2 in small)
        ], bme
    if kind == "contained_by":
        # Intervals.containedBy(small, big): small's intervals lying
        # inside an interval of big (ContainedByIntervalsSource)
        small, sme = eval_source(spec[1], pls_by_term)
        big, _ = eval_source(spec[2], pls_by_term)
        return [
            (s, e)
            for s, e in small
            if any(s2 <= s and e <= e2 for s2, e2 in big)
        ], sme
    if kind == "not_containing":
        # Intervals.notContaining(minuend, subtrahend): minuend intervals
        # containing NO subtrahend interval (NonOverlappingIntervalsSource
        # family, DifferenceIntervalsSource.java)
        big, bme = eval_source(spec[1], pls_by_term)
        small, _ = eval_source(spec[2], pls_by_term)
        return [
            (s, e)
            for s, e in big
            if not any(s <= s2 and e2 <= e for s2, e2 in small)
        ], bme
    if kind == "not_contained_by":
        # Intervals.notContainedBy(small, big): small's intervals NOT
        # lying inside any interval of big
        small, sme = eval_source(spec[1], pls_by_term)
        big, _ = eval_source(spec[2], pls_by_term)
        return [
            (s, e)
            for s, e in small
            if not any(s2 <= s and e <= e2 for s2, e2 in big)
        ], sme
    raise ValueError(f"unknown interval source {kind!r}")


def interval_freq(iv: Sequence[Interval], min_extent: int) -> np.float32:
    """``IntervalScorer.ensureFreq`` (``IntervalScorer.java:60-69``):
    float32 accumulation of 1/max(length - minExtent + 1, 1)."""
    f = F32(0.0)
    for s, e in iv:
        f = F32(float(f) + 1.0 / max((e - s + 1) - min_extent + 1, 1))
    return f


def saturation_score(freq, pivot: float, weight: float) -> np.float32:
    """``IntervalScoreFunction.SaturationFunction``: the 1 - k/(f+k)
    algebraic form, float32."""
    return F32(
        F32(weight) * (F32(1.0) - F32(pivot) / (F32(pivot) + F32(freq)))
    )
