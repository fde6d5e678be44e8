"""SmallFloat norm quantization — spec-exact port of Lucene 8's
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java``
(#longToInt4 / #int4ToLong / #intToByte4 / #byte4ToInt).

Document field length (token count after stopword removal) is quantized to
ONE byte per doc: a 4-bit-mantissa floating-point encoding. Small lengths
(< NUM_FREE_VALUES = 24) are exact; larger lengths are bucketed
logarithmically. BM25 decodes the byte through a frozen 256-entry table
(``BM25Similarity#LENGTH_TABLE``). Rank-identity with Lucene requires this
table to be bit-exact, so everything here is integer math only.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Encode a non-negative int with 4 mantissa bits (Lucene longToInt4)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        # subnormal value
        return i
    # normal value: keep 4 significant bits, drop the implicit leading one
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    # encode the shift, +1 because 0 is reserved for subnormal values
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    """Decode long_to_int4 (Lucene int4ToLong)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        # subnormal value
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24 (lengths 0..23 are exact)


def int_to_byte4(i: int) -> int:
    """Quantize a field length to an unsigned norm byte (Lucene intToByte4).

    Returned as 0..255 (unsigned view of Lucene's java byte).
    """
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned norm byte back to a (bucketed) length."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# The 256-entry decode table (== BM25Similarity.LENGTH_TABLE): LENGTH_TABLE[j]
# is the decoded doc length for norm byte j. Frozen once at import.
LENGTH_TABLE: np.ndarray = np.array([byte4_to_int(j) for j in range(256)], dtype=np.int64)

# Vectorized encoder: lengths are bounded in practice (maxTokenLength-split
# turns), but build the mapping analytically so any int64 encodes correctly.


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array → uint8 norm bytes.

    Uses a binary search against the monotone LENGTH_TABLE: the encoded byte
    for length L is the largest j with LENGTH_TABLE[j] <= L (quantization
    rounds down, exactly like intToByte4's truncating shift).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    if np.any(lengths < 0):
        raise ValueError("lengths must be non-negative")
    # LENGTH_TABLE is strictly increasing from index 0..255 except it is
    # non-decreasing generally; searchsorted(side='right')-1 gives the
    # greatest j with table[j] <= L.
    idx = np.searchsorted(LENGTH_TABLE, lengths, side="right") - 1
    return idx.astype(np.uint8)
