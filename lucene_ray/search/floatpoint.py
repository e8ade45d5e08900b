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


def double_multi_range_query(field: str, ranges):
    """DoublePointMultiRangeBuilder (sandbox/document/
    DoublePointMultiRangeBuilder.java): a MultiRangeQuery whose [lo, hi]
    pairs are the sortable-encoded double bounds — value in ANY range,
    bounds inclusive, None = open."""
    from lucene_ray.search.query import MultiRangeQuery

    enc = tuple(
        (
            None if lo is None else int(double_to_sortable_long(float(lo))),
            None if hi is None else int(double_to_sortable_long(float(hi))),
        )
        for lo, hi in ranges
    )
    return MultiRangeQuery(field, enc)


# ------------------------------------------------ HalfFloatPoint field

def _synth_hfscore(table, global_docids) -> np.ndarray:
    """HalfFloatPoint demo field: (n_chars - 300) narrowed to float16 and
    stored as the sortable short (sandbox/document/HalfFloatPoint.java —
    util/halffloat.py encoder). |n_chars - 300| < 2048, so every value is
    EXACTLY representable in fp16 and the oracle compares plain ints."""
    import pyarrow.compute as pc

    from lucene_ray.util.halffloat import half_float_to_sortable_short

    ln = (
        pc.fill_null(pc.utf8_length(table.column("content").combine_chunks()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    return half_float_to_sortable_short(
        (ln - 300.0).astype(np.float32)
    ).astype(np.int64)


def half_range_query(field: str, lower: float | None, upper: float | None):
    """HalfFloatPoint.newRangeQuery (bounds inclusive after the fp16
    narrowing — callers wanting exclusive bounds use halffloat
    next_up/next_down, as the reference documents)."""
    from lucene_ray.search.query import PointRangeQuery
    from lucene_ray.util.halffloat import half_float_range_bounds

    lo, hi = half_float_range_bounds(lower, upper)
    return PointRangeQuery(field, lo, hi)


def half_exact_query(field: str, value: float):
    return half_range_query(field, value, value)


def half_set_query(field: str, values):
    """HalfFloatPoint.newSetQuery over the sortable shorts."""
    from lucene_ray.search.query import PointInSetQuery
    from lucene_ray.util.halffloat import half_float_to_sortable_short

    return PointInSetQuery(
        field,
        tuple(sorted(int(half_float_to_sortable_short(float(v))) for v in values)),
    )


# ------------------------------------------- FloatPointNearestNeighbor

def point_nearest(
    reader,
    field: str,
    origin: float,
    k: int,
    decode=sortable_long_to_double,
    encode=double_to_sortable_long,
) -> list[tuple[int, float]]:
    """FloatPointNearestNeighbor.nearest (sandbox/document/
    FloatPointNearestNeighbor.java) over a 1-D sortable-encoded point
    field: the k docs whose decoded value is nearest to ``origin``,
    ordered (distance asc, docid asc — the reference pops its hit queue
    with the higher-docID-is-worse tie-break, :195).

    Per segment, a two-pointer walk outward from the origin's position in
    the value-sorted points table — each side is distance-monotone
    (decoded order == sortable order), so the merge yields that segment's
    k nearest in O(log n + k + t) where t is the final tie run, decoding
    ONLY the visited rows; the driver merges k rows per segment (the same
    bounded-reduce shape as spatial.nearest_topk). Deleted docs are
    skipped. Returns [(global_docid, distance)]."""
    out: list[tuple[float, int]] = []
    enc_origin = encode(float(origin))
    for e in reader.segments:
        sr = reader.segment_reader(e.name)
        pts = sr._points_table()
        if field not in pts:
            continue
        vals, docs = pts[field]
        if sr.live_mask is not None:
            keep = sr.live_mask[docs]
            vals, docs = vals[keep], docs[keep]
        n = len(vals)
        if n == 0:
            continue

        def dist_at(i):
            return abs(float(decode(int(vals[i]))) - origin)

        pos = int(np.searchsorted(vals, enc_origin, side="left"))
        lo, hi = pos - 1, pos
        got: list[tuple[float, int]] = []
        while len(got) < k and (lo >= 0 or hi < n):
            dl = dist_at(lo) if lo >= 0 else math.inf
            dh = dist_at(hi) if hi < n else math.inf
            if dl < dh:
                got.append((dl, int(docs[lo])))
                lo -= 1
            elif dh < dl:
                got.append((dh, int(docs[hi])))
                hi += 1
            else:
                # equal distances: emit both (trim later), docid order is
                # restored by the final sort
                got.append((dl, int(docs[lo])))
                got.append((dh, int(docs[hi])))
                lo -= 1
                hi += 1
        # same-distance rows just outside the window may carry LOWER
        # docids than an admitted one; extend through every row tied
        # with the current worst distance before cutting to k
        if got:
            worst = max(d for d, _ in got)
            while lo >= 0 and dist_at(lo) <= worst:
                got.append((dist_at(lo), int(docs[lo])))
                lo -= 1
            while hi < n and dist_at(hi) <= worst:
                got.append((dist_at(hi), int(docs[hi])))
                hi += 1
        got.sort()
        out.extend((d, g + sr.docid_base) for d, g in got[:k])
    out.sort()
    return [(doc, dist) for dist, doc in out[:k]]
