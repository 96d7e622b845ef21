"""Exact sloppy-phrase matching — reimplements the reference semantics of
``core/search/SloppyPhraseMatcher.java`` (greedy least-position
propagation over per-term position lists, repeat-group collision
handling, per-match ``sloppyWeight = 1/(1+matchLength)`` accumulated into
a float phrase frequency by the scorer, ``PhraseScorer`` /
``PhraseWeight``).

Notes carried over from the reference's own javadoc: the traversal always
propagates the least PhrasePosition, so not every valid combination is
counted — e.g. doc ``a b c b a`` scores differently for ``"a b c"~4`` vs
``"c b a"~4``. That asymmetry is part of the semantics being replicated,
not a bug.

Differences in machinery (not semantics): the reference keeps a binary
heap and re-queues entries whose keys changed during repeat-collision
resolution; phrase arity is tiny, so this implementation scans for the
minimum each step — ordering is always fresh, the pop sequence is the
heap's by construction. Multi-term (synonym) phrase positions don't
exist in this engine, so the ``hasMultiTermRpts`` paths are not needed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class _PP:
    """One phrase term's positions in one doc (``PhrasePositions.java``):
    ``position`` = token position − query offset, so an exact match has
    every pp at the same position."""

    __slots__ = ("positions", "idx", "offset", "ord", "position", "rpt_group")

    def __init__(self, positions: np.ndarray, offset: int, ord_: int):
        self.positions = positions
        self.offset = offset
        self.ord = ord_
        self.idx = 0
        self.position = 0
        self.rpt_group = -1

    def first_position(self) -> bool:
        self.idx = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.idx < len(self.positions):
            self.position = int(self.positions[self.idx]) - self.offset
            self.idx += 1
            return True
        return False

    def sort_key(self):
        return (self.position, self.offset, self.ord)


class SloppyPhraseMatcher:
    """Per-doc matcher. ``terms`` may repeat; ``pos_lists[i]`` is term
    i's sorted token positions in the doc; offset of term i is i."""

    def __init__(
        self,
        terms: Sequence[str],
        pos_lists: Sequence[np.ndarray],
        slop: int,
    ):
        self.slop = slop
        self.pps = [
            _PP(pos, i, i) for i, pos in enumerate(pos_lists)
        ]
        # repeat groups: phrase terms occurring more than once, grouped by
        # term, each group sorted by query offset (sortRptGroups)
        by_term: Dict[str, List[_PP]] = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(self.pps[i])
        self.rpt_groups: List[List[_PP]] = []
        for t, group in by_term.items():
            if len(group) > 1:
                group.sort(key=lambda pp: pp.offset)
                gi = len(self.rpt_groups)
                for pp in group:
                    pp.rpt_group = gi
                self.rpt_groups.append(group)
        self.has_rpts = bool(self.rpt_groups)
        self.queue: List[_PP] = []
        self.end = -(1 << 60)
        self.match_length = 1 << 60
        self.positioned = self._init_positions()

    # -- queue as a scan-min list (fresh ordering, tiny arity) -------------

    def _pop(self) -> _PP:
        i = min(range(len(self.queue)), key=lambda j: self.queue[j].sort_key())
        return self.queue.pop(i)

    def _top_position(self) -> int:
        return min(self.queue, key=lambda pp: pp.sort_key()).position

    # -- init --------------------------------------------------------------

    def _init_positions(self) -> bool:
        for pp in self.pps:
            if not pp.first_position():
                return False
        if self.has_rpts and not self._advance_repeat_groups():
            return False
        self.end = max(pp.position for pp in self.pps)
        self.queue = list(self.pps)
        return True

    def _advance_repeat_groups(self) -> bool:
        """Start condition: no two pps of a group on the same token
        position — advance the j-th (by offset) group member j times
        (``advanceRepeatGroups``, single-term-repeat case)."""
        for rg in self.rpt_groups:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return False
        return True

    # -- matching ----------------------------------------------------------

    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    def _collide(self, pp: _PP) -> Optional[_PP]:
        tp = pp.position + pp.offset
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2
        return None

    def _advance_rpts(self, pp: _PP) -> bool:
        """Resolve the (single possible) repeater collision by advancing
        the lesser of the two colliding pps (``advanceRpts``)."""
        if pp.rpt_group < 0:
            return True
        while True:
            other = self._collide(pp)
            if other is None:
                return True
            if (pp.position, pp.offset) >= (other.position, other.offset):
                pp = other
            if not self._advance_pp(pp):
                return False

    def next_match(self) -> bool:
        if not self.positioned:
            return False
        pp = self._pop()
        self.match_length = self.end - pp.position
        next_pos = self._top_position()
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break
            if pp.position > next_pos:  # done minimizing this match
                self.queue.append(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self._pop()
                next_pos = self._top_position()
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop

    def sloppy_weight(self) -> np.float32:
        return np.float32(1.0) / (np.float32(1.0) + np.float32(self.match_length))


def sloppy_phrase_freq(
    terms: Sequence[str],
    pos_lists: Sequence[np.ndarray],
    slop: int,
) -> np.float32:
    """Float phrase frequency of one doc: Σ 1/(1+matchLength) over the
    matcher's match stream (``PhraseScorer``'s freq accumulation, float32
    additions in match order)."""
    m = SloppyPhraseMatcher(terms, pos_lists, slop)
    freq = np.float32(0.0)
    while m.next_match():
        freq = freq + m.sloppy_weight()
    return freq
