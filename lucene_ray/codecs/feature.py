"""FeatureField / DOCS_AND_CUSTOM_FREQS — static scoring factors stored
in the postings freq slot.

The reference stores per-(term, doc) *feature values* as term
frequencies: the float32 value's top 9 significant bits, obtained by
``Float.floatToIntBits(v) >>> 15`` (``core/document/FeatureField.java:185-188``),
decoded back with ``intBitsToFloat(freq << 15)`` (``FeatureField.java:240-250``).
The fork generalizes this into an index option — ``DOCS_AND_CUSTOM_FREQS``
(``core/index/IndexOptions.java:51-56``): freqs are opaque scores, each
term occurs at most once per doc, positions are omitted, and the field
length counts 1 per term (``core/index/IndexingChain.java:1972-1974``,
``core/index/FieldInfo.java:717-723``).

Query-side scoring functions (``FeatureField.java`` LinearFunction :262-289,
LogFunction :326-376, SaturationFunction :440-470, SigmoidFunction
:522-551) are replicated with the exact float32/float64 op sequence so
scores hash-match the DuckDB oracle:

- linear:   ``w * S``                       (float32 ops)
- log:      ``(float)(w * Math.log(a + S))``   (a+S float32, log/mul double)
- satu:     ``w * (1 - k / (S + k))``       (float32 ops)
- sigmoid:  ``(float)(w * (1 - k^a / (S^a + k^a)))``  (double ops)

All are monotone increasing in S, so per-block max freqs (competitive
impacts) bound the block max score — feature clauses are WAND-prunable,
the design rationale in ``FeatureField.java:47-52``.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32

#: ``FeatureField.MAX_FREQ = Float.floatToIntBits(Float.MAX_VALUE) >>> 15``
MAX_FREQ = int(np.float32(np.finfo(np.float32).max).view(np.uint32)) >> 15
#: ``Float.MIN_NORMAL`` — smallest legal feature value
MIN_NORMAL = float(np.uint32(0x00800000).view(np.float32))
_F32_MAX = np.float32(np.finfo(np.float32).max)


def encode_feature_values(vals) -> np.ndarray:
    """float32 feature values → uint32 custom freqs (top 9 significant
    bits; ``FeatureField.tokenStream``: ``floatToIntBits(v) >>> 15``).
    Raises on non-finite or sub-normal/non-positive values, matching
    ``FeatureField.setFeatureValue`` (:152-174)."""
    v = np.asarray(vals, dtype=np.float32)
    if not np.all(np.isfinite(v)):
        raise ValueError("feature values must be finite")
    if np.any(v < MIN_NORMAL):
        raise ValueError(
            f"feature values must be >= Float.MIN_NORMAL ({MIN_NORMAL:g})"
        )
    return (v.view(np.uint32) >> np.uint32(15)).astype(np.uint32)


def decode_feature_values(freqs) -> np.ndarray:
    """uint32 custom freqs → float32 feature values
    (``FeatureField.decodeFeatureValue``: freq > MAX_FREQ saturates to
    Float.MAX_VALUE, else ``intBitsToFloat(freq << 15)``)."""
    tf = np.asarray(freqs, dtype=np.uint32)
    out = (tf << np.uint32(15)).view(np.float32)
    if np.any(tf > MAX_FREQ):
        out = np.where(tf > MAX_FREQ, _F32_MAX, out)
    return out


FEATURE_FUNCTIONS = ("linear", "log", "satu", "sigmoid")


def feature_scores(
    function: str,
    values: np.ndarray,
    weight: float,
    pivot: float = 1.0,
    scale: float = 1.0,
    exp: float = 1.0,
) -> np.ndarray:
    """Score decoded feature values S under one of the four reference
    functions, with the reference's exact op widths/order (see module
    docstring). ``values`` must be float32."""
    f = np.asarray(values, dtype=F32)
    w = F32(weight)
    if function == "linear":
        # LinearFunction.doScore: w * f (float ops)
        return w * f
    if function == "log":
        # LogFunction.doScore: (float)(weight * Math.log(scalingFactor + f))
        # — float32 add, then double log and double multiply
        s = F32(scale) + f
        return (np.float64(w) * np.log(s.astype(np.float64))).astype(F32)
    if function == "satu":
        # SaturationFunction.doScore: weight * (1 - pivot / (f + pivot))
        p = F32(pivot)
        return w * (F32(1.0) - p / (f + p))
    if function == "sigmoid":
        # SigmoidFunction.doScore:
        # (float)(weight * (1 - pivotPa / (Math.pow(f, a) + pivotPa)))
        a = float(exp)
        pivot_pa = float(pivot) ** a
        return (
            np.float64(weight)
            * (1.0 - pivot_pa / (np.power(f.astype(np.float64), a) + pivot_pa))
        ).astype(F32)
    raise ValueError(f"unknown feature function {function!r}")
