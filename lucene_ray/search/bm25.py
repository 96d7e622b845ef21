"""BM25 similarity — bit-exact float32 replication of the reference.

Formulas (``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``):

- ``idf = (float) ln(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``
  computed in float64 then narrowed to float32 (:138-141).
- ``avgdl = (float)(sumTotalTermFreq / (double) docCount)`` (:144-146).
- 256-entry cache ``normInv[b] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[b] / avgdl))``
  in float32, Java left-associative order (:219).
- ``weight = boost * idf`` (float32) (:264).
- ``score = weight - weight / (1 + freq * normInv)`` — the exact algebraic
  form matters for float32 equality and monotonicity (:271-286).
- Fork extra: optional ``k3`` query-term saturation
  ``((k3+1)*qtf)/(k3+qtf)`` (:130-136), disabled when k3 < 0 (default).

All NumPy ops are float32 elementwise, which rounds identically to Java's
float arithmetic (both IEEE-754 round-to-nearest-even).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_ray.codecs.smallfloat import LENGTH_TABLE

F32 = np.float32


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """float64 log, narrowed to float32 — matches ``(float) Math.log(...)``."""
    return F32(math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return F32(sum_total_term_freq / float(doc_count))


@dataclass
class BM25Scorer:
    """Per-(field, term-set) scorer with the precomputed norm-inverse cache.

    ``score(freqs, norm_bytes)`` is vectorized over postings blocks.
    """

    weight: np.float32
    norm_inverse: np.ndarray  # float32[256]

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        freqs = np.asarray(freqs, dtype=np.float32)
        inv = self.norm_inverse[np.asarray(norm_bytes, dtype=np.uint8)]
        w = self.weight
        return w - w / (F32(1.0) + freqs * inv)

    def max_score(self, max_freq: float = np.inf) -> np.float32:
        """Upper bound of this scorer: freq→∞ ⇒ score→weight; with a block
        max-impact ``(freq, norm)`` pair use ``score`` on it instead."""
        if math.isinf(max_freq):
            return self.weight
        best = self.score(np.array([max_freq], np.float32),
                          np.array([self._best_norm], np.uint8))
        return F32(best[0])

    @property
    def _best_norm(self) -> int:
        return int(np.argmax(self.norm_inverse))


class BM25Similarity:
    """Stateless similarity factory: defaults k1=1.2, b=0.75, k3 disabled."""

    def __init__(self, k1: float = 1.2, b: float = 0.75, k3: float = -1.0):
        self.k1 = F32(k1)
        self.b = F32(b)
        self.k3 = F32(k3)

    def compute_query_term_weight(self, qtf: int) -> np.float32:
        if self.k3 < 0:
            return F32(qtf)
        k3 = self.k3
        return ((k3 + F32(1.0)) * F32(qtf)) / (k3 + F32(qtf))

    def norm_inverse_cache(self, avgdl: np.float32) -> np.ndarray:
        """float32[256] — Java order: ``1f / (k1 * ((1-b) + b*LT[i]/avgdl))``
        with ``b*LT[i]`` multiplied before the division (left-assoc)."""
        one = F32(1.0)
        k1, b = self.k1, self.b
        return one / (k1 * ((one - b) + (b * LENGTH_TABLE) / F32(avgdl)))

    def scorer(
        self,
        boost: float,
        doc_count: int,
        sum_total_term_freq: int,
        doc_freq: int,
    ) -> BM25Scorer:
        w = F32(boost) * idf(doc_freq, doc_count)
        avgdl = avg_field_length(sum_total_term_freq, doc_count)
        return BM25Scorer(weight=w, norm_inverse=self.norm_inverse_cache(avgdl))
