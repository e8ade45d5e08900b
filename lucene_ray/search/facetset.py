"""Facet sets — the facet/facetset package (FacetSetsField.java packed
BinaryDocValues encoding; ExactFacetSetMatcher / RangeFacetSetMatcher /
MatchingFacetSetsCounts).

A facet-set field stores, per doc, a LIST of fixed-dimension long tuples
packed into one BINARY doc value: a uint32 dims header followed by each
set's dims little-endian int64s (the reference packs an int header +
big-endian sortable longs — byte order is an internal layout choice,
documented). MatchingFacetSetsCounts' contract is mirrored exactly:
each matcher's count increments once per MATCHING SET (a doc with two
matching sets contributes 2 — MatchingFacetSetsCounts.java:124-131),
while the total counts DOCS with at least one match across all matchers
(``shouldCountDoc``).

The synthetic ``fsets`` deriver gives every doc two 2-dim sets derived
from the content length — (L % 7, L % 10) and (L % 13, L % 5) — integer
arithmetic a DuckDB oracle reproduces from n_chars.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

FACETSET_DIMS = 2


# ------------------------------------------------------------------ encoding

def pack_facet_sets(sets: np.ndarray) -> tuple[int, np.ndarray]:
    """Pack an (n_docs, n_sets * dims) int64 matrix into per-doc blobs
    (FacetSetsField.toPackedValues): returns (row_bytes, uint8[n, bytes])."""
    n, width = sets.shape
    body = np.ascontiguousarray(sets.astype("<i8")).view(np.uint8).reshape(
        n, width * 8
    )
    header = np.empty((n, 4), dtype=np.uint8)
    header[:] = np.frombuffer(
        np.uint32(FACETSET_DIMS).astype("<u4").tobytes(), dtype=np.uint8
    )
    return 4 + width * 8, np.hstack([header, body])


def derive_fsets(table) -> pa.Array:
    """BINARY_DV_DERIVERS entry: two 2-dim sets per doc from the content
    length (SQL mirror: n_chars % {7,10,13,5})."""
    import pyarrow.compute as pc

    ln = (
        pc.fill_null(pc.utf8_length(table.column("content").combine_chunks()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    sets = np.stack([ln % 7, ln % 10, ln % 13, ln % 5], axis=1)
    row_bytes, rows = pack_facet_sets(sets)
    n = len(ln)
    offsets = np.arange(0, (n + 1) * row_bytes, row_bytes, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [
            None,
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(np.ascontiguousarray(rows).tobytes()),
        ],
    )


def decode_facet_sets(blobs: list) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc blobs -> (doc_set_counts int64[n], values int64[total_sets,
    dims]) — the FacetSetDecoder walk, vectorized over the concatenation."""
    counts = np.empty(len(blobs), dtype=np.int64)
    parts = []
    for i, b in enumerate(blobs):
        if not b or len(b) <= 4:
            counts[i] = 0
            continue
        dims = int(np.frombuffer(b[:4], dtype="<u4")[0])
        vals = np.frombuffer(b[4:], dtype="<i8").reshape(-1, dims)
        counts[i] = len(vals)
        parts.append(vals)
    values = (
        np.concatenate(parts)
        if parts
        else np.empty((0, FACETSET_DIMS), dtype=np.int64)
    )
    return counts, values


# ------------------------------------------------------------------ matchers

@dataclass(frozen=True)
class ExactFacetSetMatcher:
    """ExactFacetSetMatcher.java: set == values."""

    label: str
    values: tuple

    def matches_matrix(self, vals: np.ndarray) -> np.ndarray:
        want = np.asarray(self.values, dtype=np.int64)
        if vals.shape[1] != len(want):
            raise ValueError("matcher dims incompatible with encoded dims")
        return (vals == want).all(axis=1)


@dataclass(frozen=True)
class RangeFacetSetMatcher:
    """RangeFacetSetMatcher.java: per-dim inclusive [min, max] ranges."""

    label: str
    lowers: tuple
    uppers: tuple

    def matches_matrix(self, vals: np.ndarray) -> np.ndarray:
        lo = np.asarray(self.lowers, dtype=np.int64)
        hi = np.asarray(self.uppers, dtype=np.int64)
        if vals.shape[1] != len(lo):
            raise ValueError("matcher dims incompatible with encoded dims")
        return (vals >= lo).all(axis=1) & (vals <= hi).all(axis=1)


def matching_facet_sets_counts(
    reader, field: str, matchers
) -> tuple[list[tuple[str, int]], int]:
    """MatchingFacetSetsCounts over every live doc: per-matcher SET
    counts + the matched-DOC total. Deleted/soft-deleted docs are
    skipped (the reference iterates live docs only)."""
    counts = np.zeros(len(matchers), dtype=np.int64)
    tot_docs = 0
    for e in reader.segments:
        sr = reader.segment_reader(e.name)
        blobs = sr.binary_doc_values(field)
        set_counts, vals = decode_facet_sets(blobs)
        doc_of_set = np.repeat(
            np.arange(len(blobs), dtype=np.int64), set_counts
        )
        live = np.ones(len(doc_of_set), dtype=bool)
        if sr.live_mask is not None:
            live = sr.live_mask[doc_of_set]
        doc_any = np.zeros(len(blobs), dtype=bool)
        for j, m in enumerate(matchers):
            hit = m.matches_matrix(vals) & live
            counts[j] += int(hit.sum())
            np.logical_or.at(doc_any, doc_of_set[hit], True)
        tot_docs += int(doc_any.sum())
    return (
        [(m.label, int(c)) for m, c in zip(matchers, counts)],
        tot_docs,
    )
