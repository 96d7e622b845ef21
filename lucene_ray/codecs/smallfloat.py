"""SmallFloat ``intToByte4`` / ``byte4ToInt`` norm encoding.

Replicates the reference's lossy doc-length→byte encoding exactly
(``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-168``):
a float-like format for positive ints keeping 4 significant bits, with the
low 24 values stored exactly (``NUM_FREE_VALUES = 255 - longToInt4(2^31-1)``).

BM25 decodes norms through a 256-entry table
(``.../search/similarities/BM25Similarity.java:149-155``); both directions
are precomputed here as NumPy tables so encoding a column of doc lengths is
one vectorized lookup.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only positive values")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte (0..255)."""
    if i < 0:
        raise ValueError("only positive values")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte (0..255) back to the quantized int."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


# 256 decoded lengths — BM25Similarity.LENGTH_TABLE equivalent.
LENGTH_TABLE: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.float32
)
LENGTH_TABLE_INT: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.int64
)


def encode_norms(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``intToByte4`` over an int array → uint8 norms.

    Because the encoding truncates the mantissa, ``encode(L)`` is the
    largest byte ``b`` with ``decode(b) <= L`` — a single ``searchsorted``
    against the monotone decode table.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError("negative length")
    idx = np.searchsorted(LENGTH_TABLE_INT, lengths, side="right") - 1
    return idx.astype(np.uint8)


def decode_norms(norms: np.ndarray) -> np.ndarray:
    """uint8 norms → quantized float32 doc lengths (LENGTH_TABLE lookup)."""
    return LENGTH_TABLE[np.asarray(norms, dtype=np.uint8)]
