"""HalfFloatPoint encoding (util/halffloat.py) — the reference's own
test vectors (sandbox/.../TestHalfFloatPoint.java) plus exhaustive
order/round-trip sweeps over all 65536 bit patterns."""

import math
import struct

import numpy as np
import pytest

from lucene_ray.util import halffloat as hf


def _bits(v: float) -> int:
    return struct.unpack("<I", struct.pack("<f", np.float32(v)))[0]


def test_reference_conversion_vectors():
    # TestHalfFloatPoint.testHalfFloatConversion:39-51
    assert hf.half_float_to_short_bits(0.0) == 0
    assert hf.half_float_to_short_bits(-0.0) == 1 << 15
    assert hf.half_float_to_short_bits(1.4e-45) == 0  # MIN_VALUE -> 0
    vectors = [
        ("0011110000000000", 1.0),
        ("0011110000000001", 1.0009765625),
        ("1100000000000000", -2.0),
        ("0111101111111111", 65504.0),  # max value
        ("0000010000000000", 2.0 ** -14),  # min positive normal
        ("0000001111111111", 2.0 ** -14 - 2.0 ** -24),  # max subnormal
        ("0000000000000001", 2.0 ** -24),  # min positive subnormal
    ]
    for bits, value in vectors:
        b = int(bits, 2)
        assert hf.half_float_to_short_bits(value) == b, value
        assert hf.short_bits_to_half_float(b) == np.float32(value), bits


def test_round_trip_all_patterns():
    for s in range(-0x8000, 0x8000):
        v = hf.sortable_short_to_half_float(s)
        if math.isnan(v):
            continue
        assert int(hf.half_float_to_sortable_short(float(v))) == s, s


def test_sortable_order_matches_float_order():
    # finite halves, skipping NaN/inf: sortable short order == value order
    vals = []
    for s in range(-0x8000, 0x8000):
        v = hf.sortable_short_to_half_float(s)
        if math.isfinite(v):
            vals.append((s, v))
    svals = [v for _s, v in vals]
    # values must be non-decreasing in sortable order, strictly except -0/+0
    for (s1, v1), (s2, v2) in zip(vals, vals[1:]):
        assert v1 <= v2, (s1, v1, s2, v2)


def test_numpy_cast_is_the_same_encoder():
    rng = np.random.default_rng(9)
    arr = np.concatenate(
        [
            rng.uniform(-70000, 70000, 5000).astype(np.float32),
            rng.uniform(-1e-3, 1e-3, 5000).astype(np.float32),
            np.array([0.0, -0.0, 1e-45, 65504.0, 65520.0, np.inf, -np.inf],
                     dtype=np.float32),
        ]
    )
    vec = hf.half_float_to_sortable_short(arr)
    for v, s in zip(arr.tolist(), vec.tolist()):
        assert int(hf.half_float_to_sortable_short(v)) == s, v


def test_next_up_down_reference_vectors():
    # testNextUp / testNextDown
    assert math.isnan(hf.next_up(float("nan")))
    assert hf.next_up(math.inf) == math.inf
    assert hf.next_up(-math.inf) == -65504.0
    assert hf.next_up(0.0) == hf.short_bits_to_half_float(1)
    assert _bits(hf.next_up(-0.0)) == _bits(0.0)
    assert hf.next_up(1.4e-45) == hf.next_up(0.0)
    assert _bits(hf.next_up(-1.4e-45)) == _bits(-0.0)
    assert math.isnan(hf.next_down(float("nan")))
    assert hf.next_down(-math.inf) == -math.inf
    assert hf.next_down(math.inf) == 65504.0
    assert _bits(hf.next_down(0.0)) == _bits(-0.0)
    assert _bits(hf.next_down(1.4e-45)) == _bits(0.0)
    assert hf.next_down(-1.4e-45) == hf.next_down(-0.0)


def test_range_bounds_round_half_even():
    lo, hi = hf.half_float_range_bounds(1.0, 2.0)
    assert hf.sortable_short_to_half_float(lo) == 1.0
    assert hf.sortable_short_to_half_float(hi) == 2.0
    lo2, hi2 = hf.half_float_range_bounds(None, None)
    assert lo2 == -0x8000 and hi2 == 0x7FFF
    # a non-representable bound rounds to the nearest half (RNE)
    s = int(hf.half_float_to_sortable_short(1.00048828125))  # midpoint
    assert hf.sortable_short_to_half_float(s) in (1.0, 1.0009765625)
