"""Port of Lucene's SmallFloat int<->byte4 codec (doc-length norms).

Reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:147-167
(`intToByte4` / `byte4ToInt`): values below NUM_FREE_VALUES are exact, larger
values keep 4 significant bits (order-preserving, truncating).

Vectorized via a 256-entry decode table + ``np.searchsorted`` — the encoder is
exactly "largest byte whose decoded value <= i" because the decode table is
strictly increasing and Java's encoder truncates.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(i: int) -> int:
    # SmallFloat.longToInt4 (SmallFloat.java:191-209)
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    # SmallFloat.int4ToLong (SmallFloat.java:212-224)
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24 with Integer.MAX_VALUE


def _build_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int64)
    for b in range(256):
        if b < NUM_FREE_VALUES:
            out[b] = b
        else:
            out[b] = NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)
    return out


#: byte value (0..255) -> decoded int; strictly increasing.
DECODE_TABLE: np.ndarray = _build_decode_table()

#: float32 length table used by BM25's norm cache
#: (BM25Similarity.java LENGTH_TABLE static init).
LENGTH_TABLE_F32: np.ndarray = DECODE_TABLE.astype(np.float32)


def int_to_byte4(values: np.ndarray | int) -> np.ndarray:
    """Vectorized SmallFloat.intToByte4. Input: non-negative ints."""
    arr = np.asarray(values, dtype=np.int64)
    if arr.size and arr.min() < 0:
        raise ValueError("Only supports positive values")
    # encoder truncates: largest byte b with DECODE_TABLE[b] <= v
    enc = np.searchsorted(DECODE_TABLE, arr, side="right") - 1
    return enc.astype(np.uint8)


def byte4_to_int(b: np.ndarray | int) -> np.ndarray:
    """Vectorized SmallFloat.byte4ToInt. Input: uint8 byte values."""
    arr = np.asarray(b, dtype=np.int64) & 0xFF
    return DECODE_TABLE[arr]
