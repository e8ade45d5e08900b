"""DoublePoint / FloatPoint — the core floating-point 1-D point fields
(document/DoublePoint.java, document/FloatPoint.java) over the existing
int64 points machinery via NumericUtils' sortable bit-twiddle
(util/NumericUtils.java:47-82 doubleToSortableLong / floatToSortableInt:
flip the non-sign bits of negatives so two's-complement integer order ==
IEEE-754 total order, -0.0 < 0.0, NaN above +Inf).

A double point field stores ``doubleToSortableLong(value)`` in the
ordinary numeric-DV/points column; range/exact/set queries encode their
float bounds the same way, so PointRangeQuery's integer binary searches
ARE the float range (the map is a strict order isomorphism). Float32
fields encode through ``float_to_sortable_int`` (kept in the same int64
column — sortable ints order-embed in int64). nextUp/nextDown mirror
Math.nextUp/nextDown on the sortable integers.

The synthetic ``dscore`` deriver gives every doc
(n_chars - 500) * 0.1 — one IEEE multiply both numpy and DuckDB compute
identically, spanning negative/positive values so the sign-flip path is
on every gate run.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_SIGN64 = np.int64(np.uint64(1) << np.uint64(63))
_SIGN32 = np.int32(-(1 << 31))


def double_to_sortable_long(value) -> "np.ndarray | int":
    """NumericUtils.doubleToSortableLong (vectorized)."""
    scalar = np.isscalar(value) or getattr(value, "ndim", 1) == 0
    bits = np.asarray(value, dtype=np.float64).view(np.int64)
    mask = np.where(bits < 0, np.int64(0x7FFFFFFFFFFFFFFF), np.int64(0))
    out = bits ^ mask
    return int(out) if scalar else out


def sortable_long_to_double(encoded) -> "np.ndarray | float":
    scalar = np.isscalar(encoded) or getattr(encoded, "ndim", 1) == 0
    bits = np.asarray(encoded, dtype=np.int64)
    mask = np.where(bits < 0, np.int64(0x7FFFFFFFFFFFFFFF), np.int64(0))
    out = (bits ^ mask).view(np.float64)
    return float(out) if scalar else out


def float_to_sortable_int(value) -> "np.ndarray | int":
    """NumericUtils.floatToSortableInt (vectorized)."""
    scalar = np.isscalar(value) or getattr(value, "ndim", 1) == 0
    bits = np.asarray(value, dtype=np.float32).view(np.int32)
    mask = np.where(bits < 0, np.int32(0x7FFFFFFF), np.int32(0))
    out = bits ^ mask
    return int(out) if scalar else out


def sortable_int_to_float(encoded) -> "np.ndarray | float":
    scalar = np.isscalar(encoded) or getattr(encoded, "ndim", 1) == 0
    bits = np.asarray(encoded, dtype=np.int32)
    mask = np.where(bits < 0, np.int32(0x7FFFFFFF), np.int32(0))
    out = (bits ^ mask).view(np.float32)
    return float(out) if scalar else out


def next_up_double(value: float) -> float:
    """Math.nextUp: +1 on the sortable long (DoublePoint.nextUp)."""
    if math.isnan(value):
        return value
    return sortable_long_to_double(double_to_sortable_long(value) + 1)


def next_down_double(value: float) -> float:
    if math.isnan(value):
        return value
    return sortable_long_to_double(double_to_sortable_long(value) - 1)


# ------------------------------------------------------------------- fields

def _synth_dscore(table, global_docids) -> np.ndarray:
    """NUMERIC_DV deriver: sortable-encoded (n_chars - 500) * 0.1."""
    import pyarrow.compute as pc

    ln = (
        pc.fill_null(pc.utf8_length(table.column("content").combine_chunks()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    return double_to_sortable_long((ln - 500.0) * 0.1)


def _synth_fscore(table, global_docids) -> np.ndarray:
    """FloatPoint demo field: the same value narrowed to float32, stored
    as floatToSortableInt (order-embeds in the int64 points column)."""
    import pyarrow.compute as pc

    ln = (
        pc.fill_null(pc.utf8_length(table.column("content").combine_chunks()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    return float_to_sortable_int(
        ((ln - 500.0) * 0.1).astype(np.float32)
    ).astype(np.int64)


def sql_dscore(col: str = "n_chars") -> str:
    """The raw double the encoded column order-embeds (oracle side)."""
    return f"(({col}::DOUBLE - 500.0) * 0.1)"


# ------------------------------------------------------------------ queries

def double_range_query(field: str, lower: float, upper: float):
    """DoublePoint.newRangeQuery (bounds INCLUSIVE; use next_up/next_down
    for exclusive bounds, as the reference documents)."""
    from lucene_ray.search.query import PointRangeQuery

    return PointRangeQuery(
        field, double_to_sortable_long(lower), double_to_sortable_long(upper)
    )


def double_exact_query(field: str, value: float):
    return double_range_query(field, value, value)


def double_set_query(field: str, values):
    """DoublePoint.newSetQuery over the encoded points."""
    from lucene_ray.search.query import PointInSetQuery

    return PointInSetQuery(
        field, tuple(sorted(double_to_sortable_long(float(v)) for v in values))
    )


def float_range_query(field: str, lower: float, upper: float):
    from lucene_ray.search.query import PointRangeQuery

    return PointRangeQuery(
        field,
        int(float_to_sortable_int(np.float32(lower))),
        int(float_to_sortable_int(np.float32(upper))),
    )
