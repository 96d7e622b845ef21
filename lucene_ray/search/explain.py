"""Explanation tree — score attribution for a single (query, doc) pair.

The reference's ``Explanation`` is an immutable (match, value, description,
details[]) tree (``core/search/Explanation.java:28-63``) produced by
``IndexSearcher.explain`` → ``Weight.explain`` per leaf containing the doc
(``core/search/IndexSearcher.java:615-632``, ``core/search/Weight.java:79-95``).
For BM25 term scores the detail shape is fixed by
``BM25Similarity.explainScore`` (``core/search/similarities/BM25Similarity.java:
180-215``): ``score(freq=F), computed as boost * idf * tf from:`` with
``idf`` (n, N) and ``tf`` (freq, k1, b, dl, avgdl) sub-trees.

The engine guarantees the root ``value`` is bit-identical to the float32
score ``search()`` returns for that doc — it is read from the same
evaluation kernel, never recomputed from the pretty-printed factors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class Explanation:
    """(match, value, description, details) — ``Explanation.java`` shape."""

    match: bool
    value: float
    description: str
    details: Tuple["Explanation", ...] = field(default_factory=tuple)

    @staticmethod
    def match_(value: float, description: str, *details: "Explanation"):
        return Explanation(True, float(value), description, tuple(details))

    @staticmethod
    def no_match(description: str, *details: "Explanation"):
        return Explanation(False, 0.0, description, tuple(details))

    def __str__(self) -> str:
        return self._fmt(0)

    def _fmt(self, depth: int) -> str:
        # Explanation.toString(int): "value = description\n" + indented details
        pad = "  " * depth
        head = f"{pad}{self.value:g} = {self.description}\n"
        return head + "".join(d._fmt(depth + 1) for d in self.details)
