"""Analyzer chain = StandardTokenizer → simple lowercase → stop filter.

Reference semantics:

- ``StandardAnalyzer`` = StandardTokenizer → LowerCaseFilter → StopFilter,
  and the **default stopword set is empty**
  (``lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:51-91``).
- ``StopFilter`` drops matching tokens but **accumulates
  positionIncrement across dropped tokens**, preserving position gaps
  (``.../analysis/FilteringTokenFilter.java:50-58``).
- Document length for norms = number of emitted positions
  (``.../index/FieldInvertState.java:38-43``; with ``discountOverlaps``
  overlap tokens are excluded — this chain never produces overlaps).

The English stop set below matches Lucene's
``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/en/EnglishAnalyzer.java``)
for use as a non-default option.
"""

from __future__ import annotations

from typing import FrozenSet, Iterable, List, Optional, Sequence, Tuple

from lucene_ray.analysis.lowercase import simple_lowercase
from lucene_ray.analysis.tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    StandardTokenizer,
    Token,
)

ENGLISH_STOP_WORDS: FrozenSet[str] = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


class Analyzer:
    """Base analyzer: tokenize + lowercase + optional stop filtering.

    Construct once per ``map_batches`` actor (``__init__`` cost amortized);
    ``analyze`` / ``analyze_fast`` are pure and reusable across batches —
    the Ray analogue of the reference's per-thread ``ReuseStrategy``
    (``.../analysis/Analyzer.java:469-488``).
    """

    def __init__(
        self,
        stopwords: Optional[Iterable[str]] = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        lowercase: bool = True,
    ):
        self.tokenizer = StandardTokenizer(max_token_length)
        self.stopwords: FrozenSet[str] = frozenset(stopwords or ())
        self.lowercase = lowercase

    # -- full output: (term, start, end, position) -------------------------

    def analyze(self, text: str) -> List[Tuple[str, int, int, int]]:
        """Full token tuples with offsets and absolute positions.

        Position starts at 0 for the first emitted token; stopword drops
        advance the position counter (gap preservation).
        """
        lowered = simple_lowercase(text) if self.lowercase else text
        toks = self.tokenizer.tokenize(lowered)
        out: List[Tuple[str, int, int, int]] = []
        pos = -1
        stop = self.stopwords
        for t in toks:
            pos += 1
            if t.text in stop:
                continue
            out.append((t.text, t.start, t.end, pos))
        return out

    # -- hot path: terms + positions only ----------------------------------

    def analyze_fast(self, text: str) -> Tuple[List[str], Optional[List[int]]]:
        """Returns ``(terms, positions)``; ``positions is None`` means the
        dense 0..n-1 sequence (no stopwords dropped) — avoids building a
        position list in the common empty-stop-set configuration.
        """
        lowered = simple_lowercase(text) if self.lowercase else text
        terms = self.tokenizer.terms(lowered)
        if not self.stopwords:
            return terms, None
        stop = self.stopwords
        kept: List[str] = []
        positions: List[int] = []
        for pos, term in enumerate(terms):
            if term not in stop:
                kept.append(term)
                positions.append(pos)
        return kept, positions


class StandardAnalyzer(Analyzer):
    """The canonical chain with the reference's defaults (empty stop set)."""

    def __init__(
        self,
        stopwords: Optional[Iterable[str]] = None,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ):
        super().__init__(stopwords=stopwords, max_token_length=max_token_length)
