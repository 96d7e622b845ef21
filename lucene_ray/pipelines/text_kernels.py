"""Shared vectorized text kernels for the corpus-quality pipelines.

The whitespace-split → raw-list-offsets → prefix-sum segment reduction
shape is used by the Gopher quality/repetition stats, the BPE-ish token
counter, and the LM perplexity scorer; it lives here once so the subtle
invariant below has a single home.

INVARIANT: ``flat_words`` returns the ListArray's RAW ``.values`` buffer
together with its RAW ``.offsets`` — the two index the same buffer even
for sliced arrays. Do NOT mix these offsets with ``.flatten()``, which
re-bases sliced arrays and would misalign the segment reduction.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def flat_words(column) -> Tuple[pa.Array, np.ndarray]:
    """Whitespace-split a string column → (values StringArray,
    offsets int[n+1]). Empty splits are NOT removed — callers mask them
    (``pc.not_equal(values, "")``) so positional semantics (e.g. trigram
    adjacency over the raw split) stay available."""
    words = pc.split_pattern(column, " ").combine_chunks()
    return words.values, np.asarray(words.offsets)


def seg_sum(x: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a token-aligned array via one prefix sum —
    safe for empty rows (unlike ``np.add.reduceat``)."""
    c = np.concatenate([[0], np.cumsum(x, dtype=np.int64)])
    return c[offsets[1:]] - c[offsets[:-1]]
