"""128-bit fixed-width points: InetAddressPoint (core,
document/InetAddressPoint.java) and BigIntegerPoint (sandbox,
sandbox/document/BigIntegerPoint.java).

Ray/Arrow re-expression: a 16-byte point is TWO int64 1-D point fields
(``<field>_hi`` / ``<field>_lo``), each limb mapped unsigned->signed by
flipping the top bit (the NumericUtils sortable-bytes trick, so int64
order == unsigned limb order). A 128-bit range decomposes onto the limbs
the way any composite key does:

    [L, U] = (hi == L.hi AND lo >= L.lo)
           | (L.hi < hi < U.hi)
           | (hi == U.hi AND lo <= U.lo)          (collapsed when L.hi == U.hi)

so every query is a boolean composition of the EXISTING PointRangeQuery
machinery (binary searches over the value-sorted points sidecar) — no new
sidecar format. Exact = [v, v]; CIDR prefix = [net, net | hostmask]
(InetAddressPoint.newPrefixQuery:219); set = OR of exacts; nextUp/nextDown
= +-1 with overflow errors (InetAddressPoint.java:90-116).

The synthetic ``ip`` field derives each limb from the global docid by an
odd-constant wrapping multiply (bijective mod 2^64) — integer-exact in
both numpy and DuckDB HUGEINT SQL, so oracles reproduce the field from
doc_id alone (sql_hi/sql_lo + sql_range_128).
"""

from __future__ import annotations

import ipaddress

import numpy as np

U64 = 1 << 64
U128 = 1 << 128
_TOP = np.uint64(1 << 63)

# odd (bijective mod 2^64) public mixing constants: the 64-bit golden
# ratio and an xxhash64 prime
K_HI = 0x9E3779B97F4A7C15
K_LO = 0xC2B2AE3D27D4EB4F


# ------------------------------------------------------- synthetic derivers

def _u_to_s(u: np.ndarray) -> np.ndarray:
    """Unsigned limb -> signed int64 preserving order (flip the top bit —
    NumericUtils sortable encoding)."""
    return (u ^ _TOP).view(np.int64)


def synth_ip_hi(table, global_docids) -> np.ndarray:
    g = np.asarray(global_docids, dtype=np.int64).astype(np.uint64)
    return _u_to_s(g * np.uint64(K_HI))


def synth_ip_lo(table, global_docids) -> np.ndarray:
    g = np.asarray(global_docids, dtype=np.int64).astype(np.uint64)
    return _u_to_s(g * np.uint64(K_LO))


def synth_value128(doc_id: int) -> int:
    """The unsigned 128-bit point value for a docid (both limbs)."""
    return ((doc_id * K_HI) % U64) * U64 + (doc_id * K_LO) % U64


def sql_hi(col: str = "doc_id") -> str:
    """Signed hi limb from doc_id in DuckDB HUGEINT arithmetic (equals
    synth_ip_hi numerically)."""
    return (
        f"(({col}::HUGEINT * {K_HI}) % 18446744073709551616"
        f" - 9223372036854775808)"
    )


def sql_lo(col: str = "doc_id") -> str:
    return (
        f"(({col}::HUGEINT * {K_LO}) % 18446744073709551616"
        f" - 9223372036854775808)"
    )


# --------------------------------------------------------------- conversions

def _limbs(value_u: int) -> tuple[int, int]:
    """Unsigned 128 -> (signed hi, signed lo) int64 limbs."""
    if not 0 <= value_u < U128:
        raise ValueError("value out of 128-bit range")
    hi_u, lo_u = value_u >> 64, value_u & (U64 - 1)
    return hi_u - (1 << 63), lo_u - (1 << 63)


def ip_to_u128(address: str) -> int:
    """InetAddressPoint.encode: IPv4 maps into the ::ffff:0:0/96 block;
    the 16 bytes read as an unsigned big-endian integer."""
    ip = ipaddress.ip_address(address)
    if isinstance(ip, ipaddress.IPv4Address):
        ip = ipaddress.IPv6Address(0xFFFF00000000 + int(ip))
    return int(ip)


def u128_to_ip(value_u: int) -> str:
    """InetAddressPoint.decode (IPv4-mapped values render as IPv4)."""
    ip = ipaddress.IPv6Address(value_u)
    v4 = ip.ipv4_mapped
    return str(v4) if v4 is not None else str(ip)


def next_up(value_u: int) -> int:
    """InetAddressPoint.nextUp semantics on the unsigned value."""
    if value_u >= U128 - 1:
        raise OverflowError("no greater 128-bit point value")
    return value_u + 1


def next_down(value_u: int) -> int:
    if value_u <= 0:
        raise OverflowError("no smaller 128-bit point value")
    return value_u - 1


def bigint_to_u128(value_s: int) -> int:
    """BigIntegerPoint sortable encoding: signed 128 -> unsigned by adding
    the 2^127 bias (sign-bit flip)."""
    if not -(1 << 127) <= value_s < (1 << 127):
        raise ValueError("value out of signed 128-bit range")
    return value_s + (1 << 127)


# ------------------------------------------------------------------- queries

def range_query_128(field: str, lower_u: int, upper_u: int):
    """All docs with lower_u <= value <= upper_u (both inclusive,
    PointRangeQuery semantics) as ONE boolean clause."""
    from lucene_ray.search.query import NestedBooleanQuery, PointRangeQuery

    if lower_u > upper_u:
        # degenerate: match nothing (empty hi range)
        return PointRangeQuery(f"{field}_hi", 1, 0)
    lh, ll = _limbs(lower_u)
    uh, ul = _limbs(upper_u)
    if lh == uh:
        return NestedBooleanQuery(
            must=(
                PointRangeQuery(f"{field}_hi", lh, lh),
                PointRangeQuery(f"{field}_lo", ll, ul),
            )
        )
    branches = [
        NestedBooleanQuery(
            must=(
                PointRangeQuery(f"{field}_hi", lh, lh),
                PointRangeQuery(f"{field}_lo", ll, None),
            )
        ),
        NestedBooleanQuery(
            must=(
                PointRangeQuery(f"{field}_hi", uh, uh),
                PointRangeQuery(f"{field}_lo", None, ul),
            )
        ),
    ]
    if lh + 1 <= uh - 1:
        branches.insert(1, PointRangeQuery(f"{field}_hi", lh + 1, uh - 1))
    return NestedBooleanQuery(should=tuple(branches))


def exact_query_128(field: str, value_u: int):
    return range_query_128(field, value_u, value_u)


def prefix_query_128(field: str, value_u: int, prefix_len: int):
    """CIDR block membership (newPrefixQuery): the high ``prefix_len``
    bits fixed, the rest spanning the full range."""
    if not 0 <= prefix_len <= 128:
        raise ValueError(f"illegal prefixLength '{prefix_len}'")
    host_bits = 128 - prefix_len
    net = (value_u >> host_bits) << host_bits
    return range_query_128(field, net, net | ((1 << host_bits) - 1))


def set_query_128(field: str, values_u) -> object:
    """newSetQuery: OR of exact matches (deduplicated)."""
    from lucene_ray.search.query import NestedBooleanQuery

    return NestedBooleanQuery(
        should=tuple(exact_query_128(field, v) for v in sorted(set(values_u)))
    )


def bigint_range_query(field: str, lower_s: int, upper_s: int):
    """BigIntegerPoint.newRangeQuery (signed bounds, inclusive)."""
    return range_query_128(
        field, bigint_to_u128(lower_s), bigint_to_u128(upper_s)
    )


def bigint_exact_query(field: str, value_s: int):
    return exact_query_128(field, bigint_to_u128(value_s))


def bigint_set_query(field: str, values_s):
    return set_query_128(field, [bigint_to_u128(v) for v in values_s])


# -------------------------------------------------------------- SQL mirrors

def sql_range_128(hi_expr: str, lo_expr: str, lower_u: int, upper_u: int) -> str:
    """DuckDB twin of range_query_128: lexicographic limb compare with the
    SAME signed constants (both sides map limbs identically, so the tuple
    order is preserved exactly)."""
    if lower_u > upper_u:
        return "FALSE"
    lh, ll = _limbs(lower_u)
    uh, ul = _limbs(upper_u)
    ge = f"(({hi_expr}) > {lh} OR (({hi_expr}) = {lh} AND ({lo_expr}) >= {ll}))"
    le = f"(({hi_expr}) < {uh} OR (({hi_expr}) = {uh} AND ({lo_expr}) <= {ul}))"
    return f"({ge} AND {le})"


def sql_prefix_128(hi_expr: str, lo_expr: str, value_u: int, prefix_len: int) -> str:
    host_bits = 128 - prefix_len
    net = (value_u >> host_bits) << host_bits
    return sql_range_128(hi_expr, lo_expr, net, net | ((1 << host_bits) - 1))


def sql_set_128(hi_expr: str, lo_expr: str, values_u) -> str:
    parts = [
        sql_range_128(hi_expr, lo_expr, v, v) for v in sorted(set(values_u))
    ]
    return "(" + " OR ".join(parts) + ")" if parts else "FALSE"
