"""HalfFloatPoint encoding — float16 values as order-preserving sortable
shorts (sandbox/document/HalfFloatPoint.java:60-200, bit-exact: the
float32->float16 narrowing with round-half-even, the denormal/infinity
edges, the sortable-bits transform, and nextUp/nextDown). Scalar paths
use plain int arithmetic; ``half_float_to_sortable_short`` also accepts
numpy float32 arrays (vectorized via the same bit algebra).

Range queries over a halffloat field follow the reference recipe: store
the sortable short in a numeric point/doc-values column and query
[half_float_to_sortable_short(lo), half_float_to_sortable_short(hi)] —
ordering of sortable shorts equals float ordering (pinned across all
65536 bit patterns in tests/test_halffloat.py)."""

from __future__ import annotations

import math
import struct

import numpy as np


def _float_bits(v: float) -> int:
    return struct.unpack("<I", struct.pack("<f", np.float32(v)))[0]


def _bits_float(b: int) -> float:
    return float(struct.unpack("<f", struct.pack("<I", b & 0xFFFFFFFF))[0])


def _round_shift(i: int, shift: int) -> int:
    """roundShift (HalfFloatPoint.java:160-165): round-half-even."""
    i += 1 << (shift - 1)
    i -= (i >> shift) & 1
    return i >> shift


def half_float_to_short_bits(v: float) -> int:
    """halfFloatToShortBits:115 — IEEE half bits (unsigned 16-bit int)."""
    fb = _float_bits(v)
    sign = fb >> 31
    exp = (fb >> 23) & 0xFF
    mantissa = fb & 0x7FFFFF
    if exp == 0xFF:
        exp = 0x1F
        mantissa >>= 23 - 10
    elif exp == 0x00:
        mantissa = 0  # float denormals underflow half entirely
    else:
        exp = exp - 127 + 15
        if exp >= 0x1F:
            exp, mantissa = 0x1F, 0
        elif exp <= 0:
            shift = 23 - 10 - exp + 1
            if shift >= 32:
                exp, mantissa = 0, 0
            else:
                mantissa |= 0x800000
                mantissa = _round_shift(mantissa, shift)
                exp = mantissa >> 10
                mantissa &= 0x3FF
        else:
            mantissa = _round_shift((exp << 23) | mantissa, 23 - 10)
            exp = mantissa >> 10
            mantissa &= 0x3FF
    return ((sign << 15) | (exp << 10) | mantissa) & 0xFFFF


def short_bits_to_half_float(s: int) -> float:
    """shortBitsToHalfFloat:167 (s = unsigned 16-bit half bits)."""
    s &= 0xFFFF
    sign = s >> 15
    exp = (s >> 10) & 0x1F
    mantissa = s & 0x3FF
    if exp == 0x1F:
        exp = 0xFF
        mantissa <<= 23 - 10
    elif mantissa == 0 and exp == 0:
        pass
    else:
        if exp == 0:
            # denormal half -> normalized float
            nlz = 32 - mantissa.bit_length()
            shift = nlz - (32 - 11)
            mantissa = (mantissa << shift) & 0x3FF
            exp = exp - shift + 1
        exp = exp + 127 - 15
        mantissa <<= 23 - 10
    return _bits_float((sign << 31) | (exp << 23) | mantissa)


def _sortable_bits(s: int) -> int:
    """sortableShortBits:111 on unsigned-16 representation (the Java
    arithmetic shift of a negative short flips the low 15 bits)."""
    s &= 0xFFFF
    if s & 0x8000:
        s ^= 0x7FFF
    return s


def half_float_to_sortable_short(v) -> "int | np.ndarray":
    """halfFloatToSortableShort:102 — SIGNED short (int16 domain) whose
    order equals float order. Arrays: numpy float32 in, int16 out."""
    if isinstance(v, np.ndarray):
        # numpy's float32->float16 cast is round-half-even with the same
        # denormal/overflow behavior as halfFloatToShortBits (pinned over
        # all 65536 patterns in the tests), so the cast IS the encoder
        h = v.astype(np.float16).view(np.uint16).astype(np.int32)
        neg = (h & 0x8000) != 0
        h = np.where(neg, h ^ 0x7FFF, h)
        return h.astype(np.uint16).view(np.int16)
    u = _sortable_bits(half_float_to_short_bits(v))
    return u - 0x10000 if u & 0x8000 else u


def sortable_short_to_half_float(s: int) -> float:
    """sortableShortToHalfFloat:107 (accepts signed or unsigned 16-bit)."""
    return short_bits_to_half_float(_sortable_bits(int(s)))


def next_up(v: float) -> float:
    """nextUp:68 — first half float strictly greater than v."""
    if math.isnan(v) or v == math.inf:
        return v
    s = int(half_float_to_sortable_short(float(v)))
    r = sortable_short_to_half_float(s)
    if r <= v:
        r = sortable_short_to_half_float(s + 1)
    return r


def next_down(v: float) -> float:
    """nextDown:87 — first half float strictly smaller than v."""
    if math.isnan(v) or v == -math.inf:
        return v
    s = int(half_float_to_sortable_short(float(v)))
    r = sortable_short_to_half_float(s)
    if r >= v:
        r = sortable_short_to_half_float(s - 1)
    return r


def half_float_range_bounds(lo: float | None, hi: float | None) -> tuple[int, int]:
    """Sortable-short bounds for an inclusive [lo, hi] halffloat range
    query (HalfFloatPoint.newRangeQuery's encode step; None = open)."""
    lo_s = -0x8000 if lo is None else int(half_float_to_sortable_short(float(lo)))
    hi_s = 0x7FFF if hi is None else int(half_float_to_sortable_short(float(hi)))
    return lo_s, hi_s
