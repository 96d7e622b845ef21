"""Analysis chain: standard tokenizer -> simple lowercase -> stop filter.

Mirrors the semantics of the reference's ``StandardAnalyzer``
(``lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:51-91``):
tokenizer + per-codepoint lowercase + stopword removal with position-gap
accumulation; the default stopword set is EMPTY.
"""

from lucene_ray.analysis.analyzer import StandardAnalyzer, Analyzer
from lucene_ray.analysis.lowercase import simple_lowercase
from lucene_ray.analysis.tokenizer import StandardTokenizer, Token

__all__ = [
    "Analyzer",
    "StandardAnalyzer",
    "StandardTokenizer",
    "Token",
    "simple_lowercase",
]
