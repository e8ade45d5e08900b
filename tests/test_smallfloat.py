"""SmallFloat intToByte4/byte4ToInt conformance (SmallFloat.java:147-167)."""

import numpy as np
import pytest

from lucene_ray.util import smallfloat as sf


def java_int_to_byte4(i: int) -> int:
    # direct transliteration for cross-checking the vectorized encoder
    if i < sf.NUM_FREE_VALUES:
        return i
    return (sf.NUM_FREE_VALUES + sf._long_to_int4(i - sf.NUM_FREE_VALUES)) & 0xFF


def test_decode_table_strictly_increasing():
    assert np.all(np.diff(sf.DECODE_TABLE) > 0)


def test_small_values_exact():
    v = np.arange(0, sf.NUM_FREE_VALUES)
    assert np.array_equal(sf.byte4_to_int(sf.int_to_byte4(v)), v)


@pytest.mark.parametrize("i", [0, 1, 23, 24, 25, 39, 40, 100, 255, 1000, 65535, 10**6, 2**31 - 1])
def test_matches_java_transliteration(i):
    assert int(sf.int_to_byte4(np.array([i]))[0]) == java_int_to_byte4(i)


def test_roundtrip_truncates_and_monotone():
    rng = np.random.default_rng(42)
    v = rng.integers(0, 2**31 - 1, size=10000)
    enc = sf.int_to_byte4(v)
    dec = sf.byte4_to_int(enc)
    assert np.all(dec <= v)  # truncation
    order = np.argsort(v, kind="stable")
    assert np.all(np.diff(enc[order].astype(np.int64)) >= 0)  # order-preserving


def test_all_bytes_roundtrip():
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(sf.int_to_byte4(sf.byte4_to_int(b)), b)
