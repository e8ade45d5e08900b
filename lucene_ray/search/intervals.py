"""Intervals queries — the minimal-interval algebra of
``queries/src/java/org/apache/lucene/queries/intervals/`` (Intervals.java
factory surface; semantics per Clarke, Cormack & Burkowski's GC-list
algebra, the paper the reference package cites in its javadoc).

An *interval* is a position range ``[start, end]`` (inclusive, 0-based
analyzer positions) together with its accumulated ``gaps`` count (positions
inside the interval covered by no sub-interval — IntervalIterator.gaps()).
Every combinator returns only MINIMAL intervals: no returned interval
properly contains another returned interval
(IntervalsSource javadoc "minimal interval semantics").

Sources (factory names mirror Intervals.java):
  term(t)                  one [p, p] per occurrence
  ordered(a, b, ...)       sub-intervals in order, non-overlapping
  unordered(a, b, ...)     any order, overlap allowed (Intervals.unordered)
  phrase(a, b, ...)        ordered with zero gaps between subs (block)
  or_(a, b, ...)           union of sub-intervals
  maxgaps(n, src)          filter: gaps <= n
  maxwidth(n, src)         filter: end - start + 1 <= n
  containing(big, small)   big intervals containing >= 1 small interval
  contained_by(small, big) small intervals inside >= 1 big interval
  not_containing(big, small) / not_contained_by(small, big)  complements
  extend(src, b, a)        widen every interval by b/a positions
  overlapping(src, ref) / non_overlapping(minuend, subtrahend)
  before(src, ref) / after(src, ref)   relative position filters
  within(src, n, ref) / not_within(m, n, s)  desugar per Intervals.java
  at_least(n, ...)         minimal windows covering >= n sub-sources
  unordered_no_overlaps(a, b)  or(ordered(a,b), ordered(b,a)) verbatim

Doc SETS match the DuckDB positional-join oracle (intervals_engine gate);
scoring is engine-defined: freq = number of minimal intervals, scored like
a phrase (the reference's 1/(1+width) sloppy weight is not ported —
documented divergence, same stance as SpanNearQuery freq).

Scale note: interval evaluation is a display/query-path operator — it runs
per CANDIDATE doc (candidates pre-filtered through the inverted index by
the conjunctive/disjunctive skeleton), never per corpus row.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# source tree (frozen => hashable => LRU-query-cache keys work)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ITerm:
    term: str


@dataclass(frozen=True)
class IOrdered:
    sources: tuple


@dataclass(frozen=True)
class IUnordered:
    sources: tuple


@dataclass(frozen=True)
class IPhrase:
    sources: tuple


@dataclass(frozen=True)
class IOr:
    sources: tuple


@dataclass(frozen=True)
class IMaxGaps:
    n: int
    source: object


@dataclass(frozen=True)
class IMaxWidth:
    n: int
    source: object


@dataclass(frozen=True)
class IContaining:
    big: object
    small: object


@dataclass(frozen=True)
class IContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class INotContaining:
    big: object
    small: object


@dataclass(frozen=True)
class INotContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class IExtend:
    """Intervals.extend: every interval widened by ``before``/``after``
    positions (start clamped at 0); gaps carry through unchanged
    (ExtendedIntervalsSource semantics)."""

    source: object
    before: int
    after: int


@dataclass(frozen=True)
class IOverlapping:
    """Intervals.overlapping: source intervals overlapping >= 1 reference
    interval."""

    source: object
    reference: object


@dataclass(frozen=True)
class INonOverlapping:
    """Intervals.nonOverlapping: minuend intervals overlapping NO
    subtrahend interval."""

    minuend: object
    subtrahend: object


@dataclass(frozen=True)
class IBefore:
    """Intervals.before: source intervals that end before the start of
    some reference interval (containedBy(source, extend(point-before-
    reference, MAX, 0)) in the reference — evaluated directly here)."""

    source: object
    reference: object


@dataclass(frozen=True)
class IAfter:
    """Intervals.after: source intervals that start after the end of some
    reference interval."""

    source: object
    reference: object


@dataclass(frozen=True)
class IAtLeast:
    """Intervals.atLeast: minimal windows fully containing intervals from
    at least ``n`` distinct sub-sources (MinimumShouldMatchIntervalsSource;
    n == len(sources) degrades to unordered, n > len matches nothing —
    Intervals.atLeast:476-488)."""

    n: int
    sources: tuple


# factory helpers (Intervals.java naming)
def term(t: str) -> ITerm:
    return ITerm(t)


def ordered(*sources) -> IOrdered:
    return IOrdered(tuple(_coerce(s) for s in sources))


def unordered(*sources) -> IUnordered:
    return IUnordered(tuple(_coerce(s) for s in sources))


def phrase(*sources) -> IPhrase:
    return IPhrase(tuple(_coerce(s) for s in sources))


def or_(*sources) -> IOr:
    return IOr(tuple(_coerce(s) for s in sources))


def maxgaps(n: int, source) -> IMaxGaps:
    return IMaxGaps(int(n), _coerce(source))


def maxwidth(n: int, source) -> IMaxWidth:
    return IMaxWidth(int(n), _coerce(source))


def containing(big, small) -> IContaining:
    return IContaining(_coerce(big), _coerce(small))


def contained_by(small, big) -> IContainedBy:
    return IContainedBy(_coerce(small), _coerce(big))


def not_containing(big, small) -> INotContaining:
    return INotContaining(_coerce(big), _coerce(small))


def not_contained_by(small, big) -> INotContainedBy:
    return INotContainedBy(_coerce(small), _coerce(big))


def extend(source, before: int, after: int) -> IExtend:
    return IExtend(_coerce(source), int(before), int(after))


def overlapping(source, reference) -> IOverlapping:
    return IOverlapping(_coerce(source), _coerce(reference))


def non_overlapping(minuend, subtrahend) -> INonOverlapping:
    return INonOverlapping(_coerce(minuend), _coerce(subtrahend))


def before(source, reference) -> IBefore:
    return IBefore(_coerce(source), _coerce(reference))


def after(source, reference) -> IAfter:
    return IAfter(_coerce(source), _coerce(reference))


def within(source, positions: int, reference):
    """Intervals.within:418-421 — desugars to
    containedBy(source, extend(reference, positions, positions))."""
    return IContainedBy(
        _coerce(source), extend(reference, positions, positions)
    )


def not_within(minuend, positions: int, subtrahend):
    """Intervals.notWithin:403-407 — desugars to
    nonOverlapping(minuend, extend(subtrahend, positions, positions))."""
    return INonOverlapping(
        _coerce(minuend), extend(subtrahend, positions, positions)
    )


def at_least(n: int, *sources) -> IAtLeast:
    return IAtLeast(int(n), tuple(_coerce(s) for s in sources))


def unordered_no_overlaps(a, b) -> IOr:
    """Intervals.unorderedNoOverlaps:355-357 — or(ordered(a,b),
    ordered(b,a)) verbatim."""
    return or_(ordered(a, b), ordered(b, a))


def _coerce(s):
    return ITerm(s) if isinstance(s, str) else s


def source_terms(src) -> tuple:
    """Every term mentioned in the tree (stats collection / candidate
    pre-filter), sorted + deduped."""
    out: set[str] = set()

    def walk(s):
        if isinstance(s, ITerm):
            out.add(s.term)
        elif isinstance(s, (IOrdered, IUnordered, IPhrase, IOr)):
            for c in s.sources:
                walk(c)
        elif isinstance(s, (IMaxGaps, IMaxWidth)):
            walk(s.source)
        elif isinstance(s, (IContaining, INotContaining)):
            walk(s.big)
            walk(s.small)
        elif isinstance(s, (IContainedBy, INotContainedBy)):
            walk(s.small)
            walk(s.big)
        elif isinstance(s, IExtend):
            walk(s.source)
        elif isinstance(s, (IOverlapping, IBefore, IAfter)):
            walk(s.source)
            walk(s.reference)
        elif isinstance(s, INonOverlapping):
            walk(s.minuend)
            walk(s.subtrahend)
        elif isinstance(s, IAtLeast):
            for c in s.sources:
                walk(c)
        else:
            raise TypeError(f"unknown intervals source: {s!r}")

    walk(src)
    return tuple(sorted(out))


# ---------------------------------------------------------------------------
# per-doc algebra: intervals are (start, end, gaps) triples, returned sorted
# by (start, end) with the minimality invariant
# ---------------------------------------------------------------------------

Interval = tuple  # (start, end, gaps)


def _filter_minimal(cands: list[Interval]) -> list[Interval]:
    """Drop intervals that (properly or equally) contain another candidate:
    sort by (start asc, end asc), scan right-to-left keeping only intervals
    whose end is strictly below every end seen at a larger start
    (IntervalsSource minimality invariant)."""
    if len(cands) <= 1:
        return list(cands)
    cands = sorted(cands, key=lambda iv: (iv[0], iv[1]))
    keep = [False] * len(cands)
    min_end = None
    # right-to-left: an interval survives iff no interval with start >= its
    # start has end <= its end (other than itself); duplicates collapse
    for i in range(len(cands) - 1, -1, -1):
        s, e, g = cands[i]
        if min_end is None or e < min_end:
            keep[i] = True
            min_end = e
    out = []
    last = None
    for i, k in enumerate(keep):
        if k and (last is None or (cands[i][0], cands[i][1]) != last):
            out.append(cands[i])
            last = (cands[i][0], cands[i][1])
    return out


def _eval_ordered(subs: list[list[Interval]], block: bool) -> list[Interval]:
    """Minimal ordered spanning intervals: for each first-source interval,
    greedily chain the earliest sub-interval of each later source starting
    after the previous end (minimal sub-intervals have co-ascending starts
    and ends, so earliest start == smallest end — the NearSpansOrdered
    stretch argument). ``block=True`` additionally requires zero gap
    between consecutive subs (Intervals.phrase)."""
    cands: list[Interval] = []
    for first in subs[0]:
        s0, prev_end, gaps = first
        ok = True
        for lst in subs[1:]:
            if block:
                j = int(np.searchsorted([iv[0] for iv in lst], prev_end + 1))
                if j == len(lst) or lst[j][0] != prev_end + 1:
                    ok = False
                    break
            else:
                j = 0
                while j < len(lst) and lst[j][0] <= prev_end:
                    j += 1
                if j == len(lst):
                    ok = False
                    break
            nxt = lst[j]
            gaps += nxt[2] + (nxt[0] - prev_end - 1)
            prev_end = nxt[1]
        if ok:
            cands.append((s0, prev_end, gaps))
    return _filter_minimal(cands)


def _eval_unordered(subs: list[list[Interval]]) -> list[Interval]:
    """Minimal covering windows containing one interval from each source
    (any order, overlap allowed): pointer sweep advancing the sub-interval
    with the smallest start each round."""
    idx = [0] * len(subs)
    for lst in subs:
        if not lst:
            return []
    cands: list[Interval] = []
    while True:
        cur = [lst[i] for lst, i in zip(subs, idx)]
        s = min(iv[0] for iv in cur)
        e = max(iv[1] for iv in cur)
        # gaps: uncovered positions between subs sorted by start (overlap
        # contributes none), plus inner gaps
        by_start = sorted(cur)
        gaps = sum(iv[2] for iv in cur)
        reach = by_start[0][1]
        for iv in by_start[1:]:
            if iv[0] > reach + 1:
                gaps += iv[0] - reach - 1
            reach = max(reach, iv[1])
        cands.append((s, e, gaps))
        # advance the source holding the smallest start
        k = min(range(len(cur)), key=lambda i: cur[i][0])
        idx[k] += 1
        if idx[k] == len(subs[k]):
            break
    return _filter_minimal(cands)


def eval_source(src, pos_of) -> list[Interval]:
    """Evaluate ``src`` on one doc; ``pos_of(term)`` -> ascending ndarray of
    the term's positions in the doc. Returns minimal (start, end, gaps)."""
    if isinstance(src, ITerm):
        return [(int(p), int(p), 0) for p in pos_of(src.term)]
    if isinstance(src, (IOrdered, IPhrase)):
        subs = [eval_source(c, pos_of) for c in src.sources]
        if any(not s for s in subs):
            return []
        return _eval_ordered(subs, block=isinstance(src, IPhrase))
    if isinstance(src, IUnordered):
        subs = [eval_source(c, pos_of) for c in src.sources]
        if any(not s for s in subs):
            return []
        return _eval_unordered(subs)
    if isinstance(src, IOr):
        cands: list[Interval] = []
        for c in src.sources:
            cands.extend(eval_source(c, pos_of))
        return _filter_minimal(cands)
    if isinstance(src, IMaxGaps):
        return [iv for iv in eval_source(src.source, pos_of) if iv[2] <= src.n]
    if isinstance(src, IMaxWidth):
        return [
            iv
            for iv in eval_source(src.source, pos_of)
            if iv[1] - iv[0] + 1 <= src.n
        ]
    if isinstance(src, (IContaining, INotContaining)):
        big = eval_source(src.big, pos_of)
        small = eval_source(src.small, pos_of)
        want = isinstance(src, IContaining)
        return [
            b
            for b in big
            if any(b[0] <= s[0] and s[1] <= b[1] for s in small) == want
        ]
    if isinstance(src, (IContainedBy, INotContainedBy)):
        small = eval_source(src.small, pos_of)
        big = eval_source(src.big, pos_of)
        want = isinstance(src, IContainedBy)
        return [
            s
            for s in small
            if any(b[0] <= s[0] and s[1] <= b[1] for b in big) == want
        ]
    if isinstance(src, IExtend):
        return [
            (max(0, s - src.before), e + src.after, g)
            for s, e, g in eval_source(src.source, pos_of)
        ]
    if isinstance(src, (IOverlapping, INonOverlapping)):
        if isinstance(src, IOverlapping):
            left, right, want = src.source, src.reference, True
        else:
            left, right, want = src.minuend, src.subtrahend, False
        a = eval_source(left, pos_of)
        b = eval_source(right, pos_of)
        return [
            s
            for s in a
            if any(s[0] <= r[1] and r[0] <= s[1] for r in b) == want
        ]
    if isinstance(src, (IBefore, IAfter)):
        a = eval_source(src.source, pos_of)
        b = eval_source(src.reference, pos_of)
        if not b:
            return []
        if isinstance(src, IBefore):
            bound = max(r[0] for r in b)  # latest reference start
            return [s for s in a if s[1] < bound]
        bound = min(r[1] for r in b)  # earliest reference end
        return [s for s in a if s[0] > bound]
    if isinstance(src, IAtLeast):
        m = len(src.sources)
        if src.n > m:
            return []
        if src.n <= 0:
            raise ValueError("atLeast needs a positive minimum")
        if src.n == m:
            return eval_source(IUnordered(src.sources), pos_of)
        # minimal windows containing >= n of the sources == minimalized
        # union of the n-subsets' unordered covers (each window containing
        # exactly the subset it covers is produced by that subset; larger
        # covers are pruned by minimality — MinimumShouldMatch semantics)
        from itertools import combinations

        cands: list[Interval] = []
        for subset in combinations(src.sources, src.n):
            subs = [eval_source(c, pos_of) for c in subset]
            if any(not s for s in subs):
                continue
            cands.extend(_eval_unordered(subs))
        return _filter_minimal(cands)
    raise TypeError(f"unknown intervals source: {src!r}")


# ---------------------------------------------------------------------------
# segment evaluation: candidate docs through the inverted index, then the
# per-doc algebra on position slices
# ---------------------------------------------------------------------------


def _candidates(src, reader) -> np.ndarray:
    """Docids that could possibly match: the conjunctive/disjunctive
    skeleton of the tree evaluated on postings doc sets only (the
    filter-pre-pass; per-doc position work happens only on these)."""
    empty = np.array([], dtype=np.int64)
    if isinstance(src, ITerm):
        p = reader.postings(src.term)
        return p.docids if p is not None else empty
    if isinstance(src, (IOrdered, IUnordered, IPhrase)):
        cand = None
        for c in src.sources:
            d = _candidates(c, reader)
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return cand
        return cand if cand is not None else empty
    if isinstance(src, IOr):
        parts = [_candidates(c, reader) for c in src.sources]
        return np.unique(np.concatenate(parts)) if parts else empty
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return _candidates(src.source, reader)
    if isinstance(src, IContaining):
        return np.intersect1d(
            _candidates(src.big, reader), _candidates(src.small, reader),
            assume_unique=True,
        )
    if isinstance(src, IContainedBy):
        return np.intersect1d(
            _candidates(src.small, reader), _candidates(src.big, reader),
            assume_unique=True,
        )
    if isinstance(src, INotContaining):
        return _candidates(src.big, reader)
    if isinstance(src, INotContainedBy):
        return _candidates(src.small, reader)
    if isinstance(src, IExtend):
        return _candidates(src.source, reader)
    if isinstance(src, (IOverlapping, IBefore, IAfter)):
        return np.intersect1d(
            _candidates(src.source, reader),
            _candidates(src.reference, reader),
            assume_unique=True,
        )
    if isinstance(src, INonOverlapping):
        return _candidates(src.minuend, reader)
    if isinstance(src, IAtLeast):
        parts = [_candidates(c, reader) for c in src.sources]
        if not parts:
            return empty
        vals, counts = np.unique(np.concatenate(parts), return_counts=True)
        return vals[counts >= src.n]
    raise TypeError(f"unknown intervals source: {src!r}")


def interval_postings(reader, src) -> tuple[np.ndarray, np.ndarray]:
    """(docids, freqs) of ``src`` in one segment — freq = number of minimal
    intervals (engine-defined, see module docstring). The clause-building
    entry point (scorer.py IntervalQuery branch)."""
    empty = np.array([], dtype=np.int64)
    cand = _candidates(src, reader)
    if len(cand) == 0:
        return empty, empty
    terms = source_terms(src)
    flats = {}
    for t in terms:
        p = reader.postings(t)
        if p is None:
            flats[t] = None
            continue
        if p._ttf > 0 and len(p._pos_blob) == 0:
            raise ValueError(
                "intervals query on an index built without positions "
                "(index_options='freqs'); rebuild with 'positions'"
            )
        d_rep, abs_pos = p.flat_positions()
        flats[t] = (d_rep, abs_pos.astype(np.int64))
    z = np.array([], dtype=np.int64)
    out_docs, out_freqs = [], []
    for doc in cand:
        def pos_of(t, doc=doc):
            f = flats.get(t)
            if f is None:
                return z
            d_rep, ap = f
            lo = int(np.searchsorted(d_rep, doc, side="left"))
            hi = int(np.searchsorted(d_rep, doc, side="right"))
            return ap[lo:hi]

        ivs = eval_source(src, pos_of)
        if ivs:
            out_docs.append(int(doc))
            out_freqs.append(len(ivs))
    if not out_docs:
        return empty, empty
    return np.array(out_docs, dtype=np.int64), np.array(out_freqs, dtype=np.int64)
