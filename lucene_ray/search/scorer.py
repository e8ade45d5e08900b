"""Per-segment query execution: exhaustive TAAT oracle + block-max pruned
MaxScore path, sharing one contribution model so scores are bit-identical.

Reference machinery being re-expressed (SURVEY.md §2.11):
  - TermScorer + ImpactsDISI block skipping (search/TermScorer.java:29-95,
    search/ImpactsDISI.java:28-70): here per-128-doc blocks are decoded
    *selectively* through stored block offsets and pruned through pareto
    (tf,norm) impact metadata (MaxScoreCache.java:34-79 analog).
  - MaxScore essential/non-essential partition (search/MaxScoreBulkScorer.java:
    27-65): clauses sorted by max-score; low-bound floor θ from the k-heap;
    docs that can only be reached through non-essential clauses are never
    materialized.
  - Block-max refinement (BlockMaxConjunctionScorer / Ding&Suel BMW): before
    decoding a non-essential clause for a surviving candidate, its per-block
    max-score bound is applied.
  - Exhaustive windowed OR (search/BooleanScorer.java): the TAAT oracle —
    dense float32 accumulator over the segment's doc space.
  - Conjunction leapfrog (search/ConjunctionDISI.java): smallest-df clause
    drives; other clauses are probed by block-selective lookup.
  - Tie-breaks: score desc, then docID asc (search/HitQueue.java:78-84).

Vectorization stance: no per-doc Python loops — per-clause numpy kernels,
per-BLOCK selective decode, final exact rescore of the few survivors in
canonical clause order (guaranteeing pruned == exhaustive bit-for-bit, the
CheckHits duel contract, test-framework/.../CheckHits.java:691-712).
"""

from __future__ import annotations

import numpy as np

from lucene_ray.codec.forutil import decode_stream, decode_stream_blocks
from lucene_ray.config import BLOCK_SIZE
from lucene_ray.search.query import (
    BooleanQuery,
    CombinedFieldQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    DocValuesTermsQuery,
    IndexOrDocValuesQuery,
    SortedSetDocValuesRangeQuery,
    CoveringQuery,
    DisjunctionSumQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    NestedBooleanQuery,
    PhraseQuery,
    PointInSetQuery,
    PointRangeQuery,
    RangeFieldQuery,
    LatLonBoundingBoxQuery,
    Geo3DShapeQuery,
    GeoDistanceFeatureQuery,
    LatLonBoxQuery,
    LatLonDistanceQuery,
    LatLonPolygonQuery,
    IntervalQuery,
    SpanNearQuery,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanTermQuery,
    SpanWithinQuery,
    FeatureQuery,
    FunctionScoreQuery,
    LongDistanceFeatureQuery,
    BlendedTermQuery,
    FunctionMatchQuery,
    FunctionRangeQuery,
    MultiRangeQuery,
    NGramPhraseQuery,
    FieldExistsQuery,
    ShapeBoxQuery,
    ShapeLineQuery,
    ShapePointQuery,
    ShapePolygonQuery,
    SortedNumericRangeQuery,
    SynonymQuery,
    TermQuery,
    ParentChildrenBlockJoinQuery,
    ToChildBlockJoinQuery,
    ToParentBlockJoinQuery,
)
from lucene_ray.search.similarity import BM25Scorer

# span-algebra types evaluated through search/spans.py (SpanNearQuery keeps
# its dedicated fast path for all-term clauses)
SPAN_QUERY_TYPES = (
    SpanTermQuery,
    SpanOrQuery,
    SpanNotQuery,
    SpanFirstQuery,
    SpanPositionRangeQuery,
    SpanContainingQuery,
    SpanWithinQuery,
)

# relative safety margin applied to float upper bounds before pruning
# (absorbs float32 summation-order differences; ImpactsDISI uses exact
# float32 arithmetic instead — our bounds are float64 with a margin)
_BOUND_MARGIN = 1e-5


class SegmentTermCursor:
    """One term's postings in one segment, with lazy/selective block decode.
    Cursors are CACHED per segment reader, so decode work amortizes across
    queries (reader.term_cursor)."""

    __slots__ = ("row", "df", "_full", "_block_last", "_impacts_flat", "_tfs")

    def __init__(self, row: dict):
        self.row = row
        self.df = int(row["df"])
        self._full = None
        self._block_last = np.asarray(row["block_last_docid"], dtype=np.int64)
        self._impacts_flat = None
        self._tfs = None

    def _tf_full(self) -> np.ndarray:
        if self._tfs is None:
            self._tfs = decode_stream(self.row["tf_blob"], self.df).astype(np.int64)
        return self._tfs

    def _impacts(self):
        """Flattened impact pairs (tfs, norms, per-block reduceat offsets)."""
        if self._impacts_flat is None:
            packed_lists = self.row["impacts"]
            counts = np.array([len(p) for p in packed_lists], dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in packed_lists]
            ) if len(packed_lists) else np.array([], dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
            self._impacts_flat = (
                (flat >> 8).astype(np.int64),
                (flat & 0xFF).astype(np.int64),
                offsets,
            )
        return self._impacts_flat

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        if self._full is None:
            if self.df == 1:
                self._full = (
                    np.array([self.row["singleton_docid"]], dtype=np.int64),
                    np.array([self.row["singleton_tf"]], dtype=np.int64),
                )
            else:
                deltas = decode_stream(self.row["doc_blob"], self.df)
                docids = np.cumsum(deltas.astype(np.int64))
                tfs = decode_stream(self.row["tf_blob"], self.df).astype(np.int64)
                self._full = (docids, tfs)
        return self._full

    def block_max_scores(self, scorer: BM25Scorer) -> np.ndarray:
        tfs, norms, offsets = self._impacts()
        if len(tfs) == 0:
            return np.zeros(len(offsets), dtype=np.float64)
        return scorer.max_score_blocks(tfs, norms, offsets)

    def max_score(self, scorer: BM25Scorer) -> float:
        return float(self.block_max_scores(scorer).max(initial=0.0))

    def blocks_for(self, docids: np.ndarray) -> np.ndarray:
        """Block index that would contain each docid (searchsorted on the
        per-block last-docid column — the skip-list replacement)."""
        return np.searchsorted(self._block_last, docids, side="left")

    def lookup(self, cand: np.ndarray) -> np.ndarray:
        """tf for each candidate docid (0 where absent). ``cand`` sorted.
        Decodes only the blocks that could contain a candidate."""
        if self.df == 1:
            tf = np.zeros(len(cand), dtype=np.int64)
            hit = cand == self.row["singleton_docid"]
            tf[hit] = self.row["singleton_tf"]
            return tf
        blocks = np.unique(self.blocks_for(cand))
        blocks = blocks[blocks < len(self._block_last)]
        if self._full is not None or len(blocks) * 4 >= len(self._block_last):
            # cursor cached across queries: when candidates touch a sizable
            # share of the blocks, one full decode now is cheaper than
            # repeated selective decodes (skip-selective path kept for
            # sparse candidate sets — the WAND skip story)
            docids, tfs = self.decode_all()
        else:
            if len(blocks) == 0:
                return np.zeros(len(cand), dtype=np.int64)
            offsets = np.asarray(self.row["doc_block_offsets"], dtype=np.int64)
            d_parts = decode_stream_blocks(
                self.row["doc_blob"], self.df, offsets, blocks
            )
            # tf blocks share doc-block boundaries but only doc offsets are
            # stored; decode the tf stream fully ONCE per cursor (cached —
            # cursors persist across queries)
            tf_all = self._tf_full()
            docids_parts = []
            tf_parts = []
            for b, dp in zip(blocks, d_parts):
                start = int(b) * BLOCK_SIZE
                base = 0
                if start > 0:
                    # docids are delta-coded across block boundaries: the
                    # first delta of block b is relative to the last docid of
                    # block b-1, which we have in block_last
                    base = int(self._block_last[b - 1])
                d = np.cumsum(dp.astype(np.int64)) + base
                docids_parts.append(d)
                tf_parts.append(tf_all[start : start + len(d)])
            docids = np.concatenate(docids_parts)
            tfs = np.concatenate(tf_parts)
        idx = np.searchsorted(docids, cand)
        idx = np.minimum(idx, len(docids) - 1)
        hit = docids[idx] == cand
        out = np.zeros(len(cand), dtype=np.int64)
        out[hit] = tfs[idx[hit]]
        return out


class _Clause:
    """Evaluated clause: (sorted docids, freqs, scorer) OR a pre-scored
    (sorted docids, float32 scores) pair (DisjunctionMax). Term clauses keep
    a cursor for lazy/selective work."""

    __slots__ = ("key", "cursor", "scorer", "_eval", "_max_score", "_scored")

    def __init__(self, key, cursor, scorer, evaluated=None, max_score=None,
                 scored=None):
        self.key = key
        self.cursor = cursor
        self.scorer = scorer
        self._eval = evaluated
        self._max_score = max_score
        self._scored = scored  # (docids, float32 scores) for composite
        # clauses whose score is not a (tf, norm) function

    def evaluate(self) -> tuple[np.ndarray, np.ndarray]:
        if self._eval is None:
            if self._scored is not None:
                return self._scored[0], np.ones(len(self._scored[0]), dtype=np.int64)
            self._eval = self.cursor.decode_all()
        return self._eval

    def contrib(self, cand: np.ndarray, norm_bytes: np.ndarray):
        """(float32 contribution, matched mask) per candidate."""
        if self._scored is not None:
            docids, scores = self._scored
            out = np.zeros(len(cand), dtype=np.float32)
            m = np.zeros(len(cand), dtype=bool)
            if len(docids):
                idx = np.searchsorted(docids, cand)
                idx = np.minimum(idx, len(docids) - 1)
                m = docids[idx] == cand
                out[m] = scores[idx[m]]
            return out, m
        tfs = self.lookup(cand)
        m = tfs > 0
        s = self.scorer.score(tfs.astype(np.float32), norm_bytes[cand])
        return np.where(m, s, np.float32(0.0)), m

    def eval_scores(self, norm_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(docids, float32 scores) of every match (pruned-path full eval)."""
        if self._scored is not None:
            return self._scored
        d, tfs = self.evaluate()
        return d, self.scorer.score(tfs.astype(np.float32), norm_bytes[d])

    def lookup(self, cand: np.ndarray) -> np.ndarray:
        if self._eval is not None or self._scored is not None:
            # composite (_scored) clauses have no tf; membership counts as 1
            docids, tfs = (
                self._eval
                if self._eval is not None
                else (self._scored[0], np.ones(len(self._scored[0]), dtype=np.int64))
            )
            idx = np.searchsorted(docids, cand)
            idx = np.minimum(idx, max(len(docids) - 1, 0))
            out = np.zeros(len(cand), dtype=np.int64)
            if len(docids):
                hit = docids[idx] == cand
                out[hit] = tfs[idx[hit]]
            return out
        return self.cursor.lookup(cand)

    def max_score(self) -> float:
        if self._max_score is not None:
            return self._max_score
        if self._scored is not None:
            return float(self._scored[1].max()) if len(self._scored[1]) else 0.0
        return self.cursor.max_score(self.scorer)


_POS_SPAN = np.int64(1) << np.int64(22)  # > max in-doc position we index


def _phrase_postings(reader, terms: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Exact phrase match: (docids, phrase_freq), fully vectorized.

    ExactPhraseMatcher semantics (search/ExactPhraseMatcher.java:38) via
    int64 (docid, position) keys: a phrase starts at (d, p) iff
    (d*SPAN + p + i) is a posting key of term i for every i — so the match
    set is the running ``intersect1d`` of shifted key arrays. Positions
    beyond SPAN (~4M tokens into one doc) are not matchable (documented cap,
    the maxTokenLength-style bound for phrase spans)."""
    empty = np.array([], dtype=np.int64)
    keys = None
    for i, t in enumerate(terms):
        p = reader.postings(t)
        if p is None:
            return empty, empty
        if p._ttf > 0 and len(p._pos_blob) == 0:
            raise ValueError(
                "phrase query on an index built without positions "
                "(index_options='freqs'); rebuild with 'positions'"
            )
        d_rep, abs_pos = p.flat_positions()
        k = d_rep * _POS_SPAN + abs_pos - i
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if len(keys) == 0:
            return empty, empty
    docids_out, freqs_out = np.unique(keys // _POS_SPAN, return_counts=True)
    return docids_out.astype(np.int64), freqs_out.astype(np.int64)


def _gapped_phrase_postings(
    reader, pairs: tuple
) -> tuple[np.ndarray, np.ndarray]:
    """Phrase with EXPLICIT position offsets per term (NGramPhraseQuery's
    rewritten form, search/NGramPhraseQuery.java:66-71 builder.add(term,
    i)): a match starts at (d, p) iff term_j occurs at p + off_j for every
    kept (term_j, off_j). Same int64-key algebra as _phrase_postings with
    the offset taken from the pair instead of the enumeration index."""
    empty = np.array([], dtype=np.int64)
    keys = None
    for t, off in pairs:
        p = reader.postings(t)
        if p is None:
            return empty, empty
        if p._ttf > 0 and len(p._pos_blob) == 0:
            raise ValueError(
                "phrase query on an index built without positions "
                "(index_options='freqs'); rebuild with 'positions'"
            )
        d_rep, abs_pos = p.flat_positions()
        k = d_rep * _POS_SPAN + abs_pos - int(off)
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if len(keys) == 0:
            return empty, empty
    docids_out, freqs_out = np.unique(keys // _POS_SPAN, return_counts=True)
    return docids_out.astype(np.int64), freqs_out.astype(np.int64)


def _multi_phrase_postings(reader, slots: tuple) -> tuple[np.ndarray, np.ndarray]:
    """MultiPhraseQuery match (search/MultiPhraseQuery.java via
    UnionPostingsEnum): per position-slot, UNION the shifted (docid, pos)
    keys of the slot's alternative terms, then intersect across slots —
    the same int64-key algebra as _phrase_postings with a union layer."""
    empty = np.array([], dtype=np.int64)
    keys = None
    for i, alts in enumerate(slots):
        slot_keys = []
        for t in alts:
            p = reader.postings(t)
            if p is None:
                continue
            if p._ttf > 0 and len(p._pos_blob) == 0:
                raise ValueError(
                    "phrase query on an index built without positions "
                    "(index_options='freqs'); rebuild with 'positions'"
                )
            d_rep, abs_pos = p.flat_positions()
            slot_keys.append(d_rep * _POS_SPAN + abs_pos - i)
        if not slot_keys:
            return empty, empty
        k = (
            slot_keys[0]
            if len(slot_keys) == 1
            else np.unique(np.concatenate(slot_keys))
        )
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if len(keys) == 0:
            return empty, empty
    docids_out, freqs_out = np.unique(keys // _POS_SPAN, return_counts=True)
    return docids_out.astype(np.int64), freqs_out.astype(np.int64)


def _sloppy_phrase_postings(
    reader, terms: tuple, slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sloppy phrase match (search/SloppyPhraseMatcher.java semantics at the
    DOC-SET level): doc matches iff some selection of one occurrence per
    term has span(max(pos_i - i) - min(pos_j - j)) <= slop over
    offset-adjusted positions. freq = greedy count of non-overlapping valid
    windows (engine-defined; the reference's 1/(1+matchLength) float freq
    is not ported — doc sets are reference-identical, scores engine-owned).

    Repeated terms take a dedicated path: a selection must use DISTINCT
    source positions (SloppyPhraseMatcher's repeats handling), checked by
    brute force over the (tiny) per-doc occurrence lists.

    Vectorized gather per term; the window sweep runs only over docs
    containing ALL terms (the conjunction pre-filter), each a tiny
    merged-positions two-pointer pass."""
    empty = np.array([], dtype=np.int64)
    k = len(terms)
    per_term = []
    cand: np.ndarray | None = None
    for i, t in enumerate(terms):
        p = reader.postings(t)
        if p is None:
            return empty, empty
        if p._ttf > 0 and len(p._pos_blob) == 0:
            raise ValueError(
                "phrase query on an index built without positions "
                "(index_options='freqs'); rebuild with 'positions'"
            )
        d_rep, abs_pos = p.flat_positions()
        adj = abs_pos.astype(np.int64) - i  # offset-adjusted positions
        per_term.append((d_rep, adj))
        docs_i = p.docids
        cand = docs_i if cand is None else np.intersect1d(cand, docs_i, assume_unique=True)
        if len(cand) == 0:
            return empty, empty

    if len(set(terms)) < k:
        return _sloppy_repeats(per_term, cand, k, slop)
    return _covering_window_sweep(per_term, cand, k, slop)


def _covering_window_sweep(per_term, cand: np.ndarray, k: int, width: int):
    """Shared matcher core: docs where some window of the merged per-term
    position streams covers all k terms with max(pos) - min(pos) <= width;
    freq = greedy non-overlapping window count. Used with offset-ADJUSTED
    positions + width=slop by the sloppy phrase matcher, and with RAW
    positions + width=slop+k-1 by unordered span-near."""
    empty = np.array([], dtype=np.int64)
    # merged (doc, pos, term_idx) restricted to candidate docs
    d_all = np.concatenate([d for d, _ in per_term])
    a_all = np.concatenate([a for _, a in per_term])
    t_all = np.concatenate(
        [np.full(len(a), i, dtype=np.int64) for i, (_, a) in enumerate(per_term)]
    )
    keep = np.isin(d_all, cand, assume_unique=False)
    d_all, a_all, t_all = d_all[keep], a_all[keep], t_all[keep]
    order = np.lexsort((a_all, d_all))
    d_all, a_all, t_all = d_all[order], a_all[order], t_all[order]
    bounds = np.searchsorted(d_all, cand, side="left")
    bounds_hi = np.searchsorted(d_all, cand, side="right")

    out_docs, out_freqs = [], []
    counts = np.zeros(k, dtype=np.int64)
    for ci, doc in enumerate(cand):
        lo, hi = int(bounds[ci]), int(bounds_hi[ci])
        apos = a_all[lo:hi]
        tidx = t_all[lo:hi]
        counts[:] = 0
        covered = 0
        left = 0
        freq = 0
        for right in range(len(apos)):
            tr = tidx[right]
            counts[tr] += 1
            if counts[tr] == 1:
                covered += 1
            if covered < k:
                continue
            # shrink from the left while the window still covers all terms
            while counts[tidx[left]] > 1:
                counts[tidx[left]] -= 1
                left += 1
            if apos[right] - apos[left] <= width:
                freq += 1
                # greedy non-overlap: consume the whole window
                for j in range(left, right + 1):
                    counts[tidx[j]] -= 1
                covered = int((counts > 0).sum())
                left = right + 1
        if freq:
            out_docs.append(doc)
            out_freqs.append(freq)
    if not out_docs:
        return empty, empty
    return (
        np.array(out_docs, dtype=np.int64),
        np.array(out_freqs, dtype=np.int64),
    )


def _sloppy_repeats(per_term, cand: np.ndarray, k: int, slop: int):
    """Sloppy matching for phrases with REPEATED terms: a valid selection
    assigns each slot one occurrence with all chosen SOURCE positions
    distinct (SloppyPhraseMatcher repeats semantics). Brute force over the
    per-doc occurrence lists (tiny; combination count capped)."""
    import itertools

    empty = np.array([], dtype=np.int64)
    out_docs, out_freqs = [], []
    for doc in cand:
        lists = []
        for i, (d_rep, adj) in enumerate(per_term):
            lo = int(np.searchsorted(d_rep, doc, side="left"))
            hi = int(np.searchsorted(d_rep, doc, side="right"))
            # recover source positions (adj = pos - slot index)
            lists.append([(int(a) + i, int(a)) for a in adj[lo:hi]])
        n_combo = 1
        for L in lists:
            n_combo *= len(L)
        if n_combo > 100_000:  # pathological doc guard: approximate by
            # the non-distinct window criterion rather than O(combos) work
            lists = None
        freq = 0
        if lists is not None:
            for sel in itertools.product(*lists):
                src = [p for p, _ in sel]
                if len(set(src)) < len(src):
                    continue
                adjs = [a for _, a in sel]
                if max(adjs) - min(adjs) <= slop:
                    freq += 1
        if freq:
            out_docs.append(int(doc))
            out_freqs.append(freq)
    if not out_docs:
        return empty, empty
    return np.array(out_docs, dtype=np.int64), np.array(out_freqs, dtype=np.int64)


def _span_near_postings(
    reader, terms: tuple, slop: int, ordered: bool
) -> tuple[np.ndarray, np.ndarray]:
    """SpanNearQuery doc sets + engine-defined freqs (see query.py
    SpanNearQuery docstring for the ordered/unordered criteria and the
    reference files they mirror).

    Unordered reuses the covering-window sweep over RAW positions with
    width slop + k - 1 (max - min + 1 - k <= slop). Ordered runs a greedy
    minimal chain per start occurrence: from each position of term 0 take
    the smallest strictly-increasing positions of terms 1..k-1; the chain
    minimizes the end position, so it finds a valid selection iff one
    exists (NearSpansOrdered's stretch-to-match argument); freq counts
    non-overlapping matches greedily."""
    if len(set(terms)) < len(terms):
        raise ValueError("SpanNearQuery with repeated terms is not supported")
    empty = np.array([], dtype=np.int64)
    k = len(terms)
    per_term = []
    cand: np.ndarray | None = None
    for t in terms:
        p = reader.postings(t)
        if p is None:
            return empty, empty
        if p._ttf > 0 and len(p._pos_blob) == 0:
            raise ValueError(
                "span query on an index built without positions "
                "(index_options='freqs'); rebuild with 'positions'"
            )
        d_rep, abs_pos = p.flat_positions()
        per_term.append((d_rep, abs_pos.astype(np.int64)))
        cand = p.docids if cand is None else np.intersect1d(cand, p.docids, assume_unique=True)
        if len(cand) == 0:
            return empty, empty
    if not ordered:
        return _covering_window_sweep(per_term, cand, k, slop + k - 1)

    out_docs, out_freqs = [], []
    for doc in cand:
        pos = []
        for d_rep, ap in per_term:
            lo = int(np.searchsorted(d_rep, doc, side="left"))
            hi = int(np.searchsorted(d_rep, doc, side="right"))
            pos.append(ap[lo:hi])  # ascending (positions encoded in order)
        freq = 0
        min_start = -1
        for p0 in pos[0]:
            if p0 <= min_start:
                continue  # greedy non-overlap with the previous match
            p = int(p0)
            ok = True
            for i in range(1, k):
                j = int(np.searchsorted(pos[i], p, side="right"))
                if j == len(pos[i]):
                    ok = False
                    break
                p = int(pos[i][j])
            if ok and (p - int(p0) - (k - 1)) <= slop:
                freq += 1
                min_start = p
        if freq:
            out_docs.append(int(doc))
            out_freqs.append(freq)
    if not out_docs:
        return empty, empty
    return np.array(out_docs, dtype=np.int64), np.array(out_freqs, dtype=np.int64)


def _union_sum_tfs(parts: list[tuple[np.ndarray, np.ndarray]]):
    """Union doc sets summing tfs (SynonymQuery blended postings)."""
    if not parts:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    d = np.concatenate([p[0] for p in parts])
    t = np.concatenate([p[1] for p in parts])
    order = np.argsort(d, kind="stable")
    d, t = d[order], t[order]
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    change[1:] = d[1:] != d[:-1]
    starts = np.nonzero(change)[0]
    return d[starts], np.add.reduceat(t, starts)


def _block_join(reader, q, scorers: dict) -> tuple[np.ndarray, np.ndarray]:
    """ToParentBlockJoinQuery evaluation (join/.../ToParentBlockJoinQuery
    .java BlockJoinScorer): children precede their parent, so a matching
    child's parent is the FIRST parents-filter doc with a larger docid.
    Returns (parent docids, aggregated child scores per score_mode)."""
    empty = np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    p_clauses = build_clauses(reader, [q.parents_filter], scorers)
    if not p_clauses:
        return empty
    # parents stay UNFILTERED by live docs: a tombstoned parent still
    # delimits its block (children must not leak into the next block);
    # it can't be RETURNED because the top-level candidate live filter
    # drops it (Lucene: the BitSetProducer ignores deletions too)
    parents = np.sort(p_clauses[0].evaluate()[0])
    if len(parents) == 0:
        return empty
    c_clauses = build_clauses(reader, [q.child_query], scorers)
    if not c_clauses:
        return empty
    cd, cs = c_clauses[0].eval_scores(reader.norm_bytes)
    live = getattr(reader, "live_mask", None)
    if live is not None:
        # tombstoned CHILDREN never match nor contribute score
        m = live[cd]
        cd, cs = cd[m], cs[m]
    # a parent doc never matches as its own child
    is_parent = np.isin(cd, parents, assume_unique=True)
    cd, cs = cd[~is_parent], cs[~is_parent]
    if len(cd) == 0:
        return empty
    pidx = np.searchsorted(parents, cd, side="right")
    ok = pidx < len(parents)  # orphans after the last parent never match
    cd, cs, pidx = cd[ok], cs[ok], pidx[ok]
    if len(cd) == 0:
        return empty
    order = np.argsort(pidx, kind="stable")
    pidx_s, cs_s = pidx[order], cs[order]
    change = np.empty(len(pidx_s), dtype=bool)
    change[0] = True
    change[1:] = pidx_s[1:] != pidx_s[:-1]
    starts = np.nonzero(change)[0]
    if q.score_mode == "sum":
        agg = np.add.reduceat(cs_s.astype(np.float32), starts)
    elif q.score_mode == "none":
        agg = np.ones(len(starts), dtype=np.float32)
    else:  # max
        agg = np.maximum.reduceat(cs_s, starts)
    return parents[pidx_s[starts]], agg.astype(np.float32)


def _child_block_join(reader, q, scorers: dict) -> tuple[np.ndarray, np.ndarray]:
    """ToChildBlockJoinQuery evaluation (join/.../ToChildBlockJoinQuery
    .java ToChildBlockJoinScorer): for each parent matching parent_query,
    every live child in its block matches; child score = parent score
    (doScores) or 1.0. Block start = previous parent docid + 1 — exact
    because the build contract puts a parent LAST in every block and
    blocks never straddle segments (the prior segment always ends with a
    parent), mirroring the reference's prevParentDoc bitset walk."""
    empty = np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    p_clauses = build_clauses(reader, [q.parents_filter], scorers)
    if not p_clauses:
        return empty
    parents = np.sort(p_clauses[0].evaluate()[0])
    if len(parents) == 0:
        return empty
    m_clauses = build_clauses(reader, [q.parent_query], scorers)
    if not m_clauses:
        return empty
    pd, ps = m_clauses[0].eval_scores(reader.norm_bytes)
    # the reference throws if the parent query matches a non-parent doc
    # (ToChildBlockJoinScorer.validateParentDoc); restrict to parents and
    # keep the contract observable through the query's own semantics
    idx = np.searchsorted(parents, pd)
    is_parent = (idx < len(parents)) & (parents[np.minimum(idx, len(parents) - 1)] == pd)
    if not np.all(is_parent):
        raise ValueError(
            "ToChildBlockJoinQuery: parent_query matched a non-parent doc"
        )
    if len(pd) == 0:
        return empty
    starts = np.where(idx > 0, parents[np.maximum(idx - 1, 0)] + 1, 0)
    lengths = pd - starts  # children per block (parent itself excluded)
    keep = lengths > 0
    pd, ps, starts, lengths = pd[keep], ps[keep], starts[keep], lengths[keep]
    if len(pd) == 0:
        return empty
    total = int(lengths.sum())
    cum = np.cumsum(lengths)
    children = (
        np.arange(total, dtype=np.int64)
        - np.repeat(cum - lengths, lengths)
        + np.repeat(starts, lengths)
    )
    if q.do_scores:
        scores = np.repeat(ps, lengths).astype(np.float32)
    else:
        scores = np.ones(total, dtype=np.float32)
    live = getattr(reader, "live_mask", None)
    if live is not None:
        m = live[children]
        children, scores = children[m], scores[m]
    return children, scores


def _parent_children_join(
    reader, q, scorers: dict
) -> tuple[np.ndarray, np.ndarray]:
    """ParentChildrenBlockJoinQuery evaluation: intersect ONE parent's
    child block with the child query's matches (scores kept)."""
    empty = np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    # the query names a GLOBAL parent docid; this scorer runs per segment
    # over LOCAL docids — resolve, and bail out in every other segment
    local_parent = q.parent_docid - reader.docid_base
    if not (0 <= local_parent < reader.doc_count):
        return empty
    p_clauses = build_clauses(reader, [q.parents_filter], scorers)
    if not p_clauses:
        return empty
    parents = np.sort(p_clauses[0].evaluate()[0])
    i = int(np.searchsorted(parents, local_parent))
    if i >= len(parents) or parents[i] != local_parent:
        raise ValueError(
            f"ParentChildrenBlockJoinQuery: docid {q.parent_docid} is not a parent"
        )
    lo = int(parents[i - 1]) + 1 if i > 0 else 0
    hi = int(local_parent)  # exclusive: the parent itself is not a child
    c_clauses = build_clauses(reader, [q.child_query], scorers)
    if not c_clauses:
        return empty
    cd, cs = c_clauses[0].eval_scores(reader.norm_bytes)
    m = (cd >= lo) & (cd < hi)
    cd, cs = cd[m], cs[m]
    live = getattr(reader, "live_mask", None)
    if live is not None and len(cd):
        keep = live[cd]
        cd, cs = cd[keep], cs[keep]
    return cd, cs.astype(np.float32)


def _dv_filter_docids(reader, q) -> np.ndarray:
    """Doc set of a SORTED / SORTED_SET doc-values filter: resolve the
    query's values to segment ORDINALS once, then scan the doc-ordered ord
    column (DocValuesTermsQuery.java; SortedSetDocValuesField
    .newSlowRangeQuery → SortedSetDocValuesRangeQuery)."""
    is_set = reader.sorted_dv_is_set(q.field)
    if is_set:
        offsets, flat_ords, terms = reader.sorted_set_doc_values(q.field)
    else:
        ords, terms = reader.sorted_doc_values(q.field)
    if isinstance(q, DocValuesTermsQuery):
        want = []
        for t in q.terms:
            i = int(np.searchsorted(terms, t))
            if i < len(terms) and terms[i] == t:
                want.append(i)
        if not want:
            return np.array([], dtype=np.int64)
        want = np.asarray(want, dtype=np.int64)
        if is_set:
            hit = np.isin(flat_ords, want)
        else:
            hit = np.isin(ords, want)
    else:  # SortedSetDocValuesRangeQuery: ordinal window
        lo = (
            0
            if q.lower is None
            else int(
                np.searchsorted(
                    terms, q.lower, side="left" if q.include_lower else "right"
                )
            )
        )
        hi = (
            len(terms)
            if q.upper is None
            else int(
                np.searchsorted(
                    terms, q.upper, side="right" if q.include_upper else "left"
                )
            )
        )
        if lo >= hi:
            return np.array([], dtype=np.int64)
        src = flat_ords if is_set else ords
        hit = (src >= lo) & (src < hi)
    if is_set:
        doc_idx = np.repeat(
            np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets)
        )
        return np.unique(doc_idx[hit])
    return np.nonzero(hit)[0].astype(np.int64)


def _index_or_dv_docids(reader, q, use_dv: bool) -> np.ndarray:
    """Evaluate the chosen side of an IndexOrDocValuesQuery. Supported
    shapes: index side TermQuery (postings) or PointRangeQuery (points
    table); dv side DocValuesTermsQuery / SortedSetDocValuesRangeQuery
    (ord scan) or PointRangeQuery (NUMERIC doc-values column scan — the
    'slow' newSlowRangeQuery execution)."""
    from lucene_ray.search.query import (
        DocValuesTermsQuery as _DVT,
        PointRangeQuery as _PRQ,
        SortedSetDocValuesRangeQuery as _SSR,
        TermQuery as _TQ,
    )

    sub = q.dv_query if use_dv else q.index_query
    if isinstance(sub, _TQ):
        cur = reader.term_cursor(sub.term)
        if cur is None:
            return np.array([], dtype=np.int64)
        return cur.decode_all()[0]
    if isinstance(sub, (_DVT, _SSR)):
        return _dv_filter_docids(reader, sub)
    if isinstance(sub, _PRQ):
        if use_dv:
            vals = reader.doc_values(sub.field)
            m = np.ones(len(vals), dtype=bool)
            if sub.lower is not None:
                m &= vals >= sub.lower
            if sub.upper is not None:
                m &= vals <= sub.upper
            return np.nonzero(m)[0].astype(np.int64)
        return reader.point_range(sub.field, sub.lower, sub.upper)
    raise TypeError(f"unsupported IndexOrDocValuesQuery side: {type(sub)}")


def _qcache(reader, q, compute):
    """Route a compound clause's doc-set materialization through the
    segment's LRUQueryCache (UsageTrackingQueryCachingPolicy: cached from
    the second use on; plain TermQuery never goes through here)."""
    cache = getattr(reader, "query_cache", None)
    if cache is None:
        return compute()
    return cache.get_or_compute(q, compute)


def build_clauses(reader, queries: list, scorers: dict) -> list[_Clause]:
    """Materialize clause list for one segment; absent terms drop out."""
    out = []
    for q in queries:
        if isinstance(q, TermQuery):
            cur = reader.term_cursor(q.term)
            if cur is None:
                continue
            out.append(_Clause(q, cur, scorers[q]))
        elif isinstance(q, PhraseQuery):
            if getattr(q, "slop", 0) > 0:
                docids, freqs = _qcache(
                    reader, q, lambda: _sloppy_phrase_postings(reader, q.terms, q.slop)
                )
            else:
                docids, freqs = _qcache(
                    reader, q, lambda: _phrase_postings(reader, q.terms)
                )
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(
                sc.score(freqs.astype(np.float32), reader.norm_bytes[docids]).max()
            )
            out.append(_Clause(q, None, sc, (docids, freqs), max_score=ms))
        elif isinstance(q, NGramPhraseQuery):
            docids, freqs = _qcache(
                reader, q, lambda q=q: _gapped_phrase_postings(reader, q.kept())
            )
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(
                sc.score(freqs.astype(np.float32), reader.norm_bytes[docids]).max()
            )
            out.append(_Clause(q, None, sc, (docids, freqs), max_score=ms))
        elif isinstance(q, MultiPhraseQuery):
            docids, freqs = _qcache(
                reader, q, lambda: _multi_phrase_postings(reader, q.slots)
            )
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(
                sc.score(freqs.astype(np.float32), reader.norm_bytes[docids]).max()
            )
            out.append(_Clause(q, None, sc, (docids, freqs), max_score=ms))
        elif isinstance(q, IntervalQuery):
            from lucene_ray.search.intervals import interval_postings

            docids, freqs = _qcache(
                reader, q, lambda: interval_postings(reader, q.source)
            )
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(
                sc.score(freqs.astype(np.float32), reader.norm_bytes[docids]).max()
            )
            out.append(_Clause(q, None, sc, (docids, freqs), max_score=ms))
        elif isinstance(q, SpanNearQuery):
            if all(isinstance(t, str) for t in q.terms):
                docids, freqs = _qcache(
                    reader, q,
                    lambda: _span_near_postings(reader, q.terms, q.slop, q.ordered),
                )
            else:
                # span-source composition (SpanOr/Not/First sub-clauses)
                from lucene_ray.search.spans import span_postings

                docids, freqs = _qcache(
                    reader, q, lambda: span_postings(reader, q)
                )
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(
                sc.score(freqs.astype(np.float32), reader.norm_bytes[docids]).max()
            )
            out.append(_Clause(q, None, sc, (docids, freqs), max_score=ms))
        elif isinstance(q, SPAN_QUERY_TYPES):
            from lucene_ray.search.spans import span_postings

            docids, freqs = _qcache(reader, q, lambda: span_postings(reader, q))
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(
                sc.score(freqs.astype(np.float32), reader.norm_bytes[docids]).max()
            )
            out.append(_Clause(q, None, sc, (docids, freqs), max_score=ms))
        elif isinstance(q, SynonymQuery):
            def _syn_union(q=q):
                parts = []
                for t in q.terms:
                    p = reader.postings(t)
                    if p is not None:
                        parts.append((p.docids, p.tfs))
                return _union_sum_tfs(parts)

            docids, tfs = _qcache(reader, q, _syn_union)
            if len(docids) == 0:
                continue
            sc = scorers[q]
            ms = float(sc.score(tfs.astype(np.float32), reader.norm_bytes[docids]).max())
            out.append(_Clause(q, None, sc, (docids, tfs), max_score=ms))
        elif isinstance(q, CombinedFieldQuery):
            sc = scorers.get(q)
            if sc is None:
                continue  # df == 0 for every (term, field) pair
            def _cfq_union(q=q):
                # disjunction over all (term, field) postings with
                # weighted float freqs (CombinedFieldScorer.freq():
                # sum of weight * tf over matching iterators)
                parts = []
                for t in q.terms:
                    for f, w in q.fields:
                        it = t if f in ("", "content") else f"{f}:{t}"
                        p = reader.postings(it)
                        if p is not None:
                            parts.append(
                                (p.docids, np.float64(w) * p.tfs)
                            )
                if not parts:
                    return (
                        np.array([], dtype=np.int64),
                        np.array([], dtype=np.float64),
                    )
                alld = np.concatenate([x[0] for x in parts])
                allf = np.concatenate([x[1] for x in parts])
                docids = np.unique(alld)
                freqs = np.zeros(len(docids), dtype=np.float64)
                np.add.at(freqs, np.searchsorted(docids, alld), allf)
                return docids, freqs

            docids, freqs = _qcache(reader, q, _cfq_union)
            if len(docids) == 0:
                continue
            # combined norm per matched doc: byte4(round(Σ w * len_f))
            # decoded from the per-field byte4 norms — the additive-norm
            # combine of MultiNormsLeafSimScorer.java:143-153
            from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

            lens = np.zeros(len(docids), dtype=np.float32)
            for f, w in q.fields:
                fn = reader.field_norms(f)
                if fn is None:
                    raise KeyError(
                        f"CombinedFieldQuery field {f!r} has no norms column"
                    )
                lens += np.float32(w) * byte4_to_int(fn[0][docids]).astype(
                    np.float32
                )
            combined_norms = int_to_byte4(
                np.floor(lens + np.float32(0.5)).astype(np.int64)
            )
            scores = sc.score(
                freqs.astype(np.float32), combined_norms
            ).astype(np.float32)
            out.append(
                _Clause(
                    q, None, sc, scored=(docids, scores),
                    max_score=float(scores.max()),
                )
            )
        elif isinstance(q, MatchAllDocsQuery):
            docids = np.arange(reader.doc_count, dtype=np.int64)
            scores = np.full(reader.doc_count, np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers[q], scored=(docids, scores)))
        elif isinstance(q, PointRangeQuery):
            docids = _qcache(
                reader, q, lambda: reader.point_range(q.field, q.lower, q.upper)
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, PointInSetQuery):
            docids = _qcache(
                reader, q, lambda: reader.point_in_set(q.field, q.values)
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, BlendedTermQuery):
            # per-term postings scored with BLENDED stats (scorers keyed
            # (q, term)), combined dismax/boolean (BlendedTermQuery.java
            # RewriteMethod variants)
            def _blended(q=q):
                empty = (
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.float32),
                )
                per_term = []
                for t in q.terms:
                    sc = scorers.get((q, t))
                    if sc is None:
                        continue
                    cur = reader.term_cursor(t)
                    if cur is None:
                        continue
                    d, tfs = cur.decode_all()
                    if len(d) == 0:
                        continue
                    s = sc.score(tfs.astype(np.float32), reader.norm_bytes[d])
                    per_term.append((d, s))
                if not per_term:
                    return empty
                all_d = np.unique(np.concatenate([d for d, _s in per_term]))
                smax = np.zeros(len(all_d), dtype=np.float32)
                ssum = np.zeros(len(all_d), dtype=np.float32)
                for d, s in per_term:
                    idx = np.searchsorted(all_d, d)
                    np.maximum.at(smax, idx, s)
                    np.add.at(ssum, idx, s)
                if q.rewrite == "boolean":
                    score = ssum
                else:  # dismax: max + tie * (sum of the others)
                    score = smax + np.float32(q.tie_breaker) * (ssum - smax)
                return all_d, score.astype(np.float32)

            d, s = _qcache(reader, q, _blended)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, FieldExistsQuery):
            def _exists(q=q):
                from lucene_ray.config import KEYWORD_FIELDS

                if q.field == "content":
                    return np.nonzero(reader.doc_len > 0)[0].astype(np.int64)
                dense = (
                    q.field in KEYWORD_FIELDS
                    or q.field in reader.doc_values_schema()
                    or q.field in reader.sorted_dv_schema()
                    or q.field in reader.binary_dv_schema()
                )
                if dense:
                    return np.arange(reader.doc_count, dtype=np.int64)
                # SORTED_NUMERIC lists are per-doc and may be EMPTY (the
                # sidecar stores a list row per doc verbatim), so existence
                # = non-empty list, not the dense all-docs set. (ADVICE r4)
                if q.field in reader.sorted_numeric_dv_schema():
                    offsets, _flat = reader.sorted_numeric_doc_values(q.field)
                    return np.nonzero(np.diff(offsets) > 0)[0].astype(np.int64)
                # indexed shapes: docs present in the shapes sidecar
                if q.field in reader.shape_fields():
                    dd = reader.shape_triangles(q.field)[0]
                    return np.unique(dd).astype(np.int64)
                return np.array([], dtype=np.int64)

            docids = _qcache(reader, q, _exists)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, ShapeBoxQuery):
            def _shapebox(q=q):
                from lucene_ray.search.spatial import (
                    tri_box_relation,
                    tri_polygon_contains,
                )

                if q.relation not in (
                    "intersects", "within", "disjoint", "contains"
                ):
                    raise ValueError(
                        f"unsupported shape relation: {q.relation!r}"
                    )
                dd, axx, ayy, bxx, byy, cxx, cyy = reader.shape_triangles(q.field)
                if len(dd) == 0:
                    return np.array([], dtype=np.int64)
                # doc-major rows: aggregate per doc with reduceat
                starts = np.nonzero(
                    np.concatenate(([True], dd[1:] != dd[:-1]))
                )[0]
                docs_u = dd[starts]
                if q.relation == "contains":
                    # the box as a 4-vertex ring through the polygon
                    # CONTAINS machinery (LatLonShapeBoundingBoxQuery's
                    # CONTAINS path, format-v9 edge flags)
                    shell = (
                        (q.min_lat, q.min_lat, q.max_lat, q.max_lat),
                        (q.min_lon, q.max_lon, q.max_lon, q.min_lon),
                    )
                    cand, notw = tri_polygon_contains(
                        (axx, ayy, bxx, byy, cxx, cyy),
                        reader.shape_edge_flags(q.field), shell,
                    )
                    any_cand = np.add.reduceat(cand.astype(np.int64), starts) > 0
                    any_notw = np.add.reduceat(notw.astype(np.int64), starts) > 0
                    return docs_u[any_cand & ~any_notw].astype(np.int64)
                inter, within = tri_box_relation(
                    (axx, ayy, bxx, byy, cxx, cyy),
                    q.min_lat, q.max_lat, q.min_lon, q.max_lon,
                )
                any_inter = np.add.reduceat(inter.astype(np.int64), starts) > 0
                all_within = (
                    np.add.reduceat(within.astype(np.int64), starts)
                    == np.diff(np.append(starts, len(dd)))
                )
                if q.relation == "intersects":
                    keep = any_inter
                elif q.relation == "within":
                    keep = all_within
                else:  # disjoint: the doc HAS a shape and nothing intersects
                    keep = ~any_inter
                return docs_u[keep].astype(np.int64)

            docids = _qcache(reader, q, _shapebox)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, ShapePolygonQuery):
            def _shapepoly(q=q):
                from lucene_ray.search.spatial import (
                    tri_polygon_contains,
                    tri_polygon_relation,
                )

                if q.relation not in (
                    "intersects", "within", "disjoint", "contains"
                ):
                    raise ValueError(
                        f"unsupported shape relation: {q.relation!r}"
                    )
                dd, axx, ayy, bxx, byy, cxx, cyy = reader.shape_triangles(
                    q.field
                )
                if len(dd) == 0:
                    return np.array([], dtype=np.int64)
                tris = (axx, ayy, bxx, byy, cxx, cyy)
                starts = np.nonzero(
                    np.concatenate(([True], dd[1:] != dd[:-1]))
                )[0]
                docs_u = dd[starts]
                counts = np.diff(np.append(starts, len(dd)))
                if q.relation == "contains":
                    cand, notw = tri_polygon_contains(
                        tris, reader.shape_edge_flags(q.field),
                        q.shell, q.holes,
                    )
                    any_cand = np.add.reduceat(cand.astype(np.int64), starts) > 0
                    any_notw = np.add.reduceat(notw.astype(np.int64), starts) > 0
                    keep = any_cand & ~any_notw
                else:
                    inter, within = tri_polygon_relation(
                        tris, q.shell, q.holes
                    )
                    any_inter = (
                        np.add.reduceat(inter.astype(np.int64), starts) > 0
                    )
                    if q.relation == "intersects":
                        keep = any_inter
                    elif q.relation == "within":
                        keep = (
                            np.add.reduceat(within.astype(np.int64), starts)
                            == counts
                        )
                    else:  # disjoint: has a shape, nothing intersects
                        keep = ~any_inter
                return docs_u[keep].astype(np.int64)

            docids = _qcache(reader, q, _shapepoly)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, ShapePointQuery):
            def _shapepoint(q=q):
                from lucene_ray.search.spatial import _point_in_tri

                if q.relation not in ("intersects", "disjoint"):
                    raise ValueError(
                        f"unsupported point relation: {q.relation!r}"
                    )
                dd, axx, ayy, bxx, byy, cxx, cyy = reader.shape_triangles(
                    q.field
                )
                if len(dd) == 0:
                    return np.array([], dtype=np.int64)
                hit = _point_in_tri(
                    float(q.lon), float(q.lat), axx, ayy, bxx, byy, cxx, cyy
                )
                starts = np.nonzero(
                    np.concatenate(([True], dd[1:] != dd[:-1]))
                )[0]
                docs_u = dd[starts]
                any_hit = np.add.reduceat(hit.astype(np.int64), starts) > 0
                keep = any_hit if q.relation == "intersects" else ~any_hit
                return docs_u[keep].astype(np.int64)

            docids = _qcache(reader, q, _shapepoint)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, ShapeLineQuery):
            def _shapeline(q=q):
                from lucene_ray.search.spatial import (
                    tri_line_contains,
                    tri_line_relation,
                )

                if q.relation not in ("intersects", "disjoint", "contains"):
                    raise ValueError(
                        f"unsupported line relation: {q.relation!r} "
                        "(a 2-D shape is never WITHIN a line)"
                    )
                dd, axx, ayy, bxx, byy, cxx, cyy = reader.shape_triangles(
                    q.field
                )
                if len(dd) == 0:
                    return np.array([], dtype=np.int64)
                tris = (axx, ayy, bxx, byy, cxx, cyy)
                starts = np.nonzero(
                    np.concatenate(([True], dd[1:] != dd[:-1]))
                )[0]
                docs_u = dd[starts]
                if q.relation == "contains":
                    cand, notw = tri_line_contains(
                        tris, reader.shape_edge_flags(q.field),
                        q.lats, q.lons,
                    )
                    any_cand = np.add.reduceat(cand.astype(np.int64), starts) > 0
                    any_notw = np.add.reduceat(notw.astype(np.int64), starts) > 0
                    keep = any_cand & ~any_notw
                else:
                    inter = tri_line_relation(tris, q.lats, q.lons)
                    any_inter = (
                        np.add.reduceat(inter.astype(np.int64), starts) > 0
                    )
                    keep = any_inter if q.relation == "intersects" else ~any_inter
                return docs_u[keep].astype(np.int64)

            docids = _qcache(reader, q, _shapeline)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, SortedNumericRangeQuery):
            def _snrange(q=q):
                offsets, flat = reader.sorted_numeric_doc_values(q.field)
                hit = np.ones(len(flat), dtype=bool)
                if q.lower is not None:
                    hit &= flat >= q.lower
                if q.upper is not None:
                    hit &= flat <= q.upper
                # ANY value in range: per-doc hit counts via a cumulative
                # sum — empty per-doc lists (offsets[d] == offsets[d+1],
                # incl. a trailing empty doc whose offset == len(flat))
                # yield 0 naturally, where reduceat would raise. (ADVICE r4)
                cum = np.zeros(len(flat) + 1, dtype=np.int64)
                np.cumsum(hit, out=cum[1:])
                per_doc = cum[offsets[1:]] - cum[offsets[:-1]]
                return np.nonzero(per_doc > 0)[0].astype(np.int64)

            docids = _qcache(reader, q, _snrange)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, MultiRangeQuery):
            def _multirange(q=q):
                parts = [
                    reader.point_range(q.field, lo, hi) for lo, hi in q.ranges
                ]
                parts = [p for p in parts if len(p)]
                if not parts:
                    return np.array([], dtype=np.int64)
                return np.unique(np.concatenate(parts))

            docids = _qcache(reader, q, _multirange)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, FunctionMatchQuery):
            def _funcmatch(q=q):
                from lucene_ray.search.expressions import compile_expression

                expr = compile_expression(q.expression)
                n = reader.doc_count
                bindings = {}
                for v in expr.variables:
                    if v == "_score":
                        raise ValueError(
                            "FunctionMatchQuery has no _score variable "
                            "(no enclosing query)"
                        )
                    elif v == "doc_len":
                        bindings[v] = reader.doc_len.astype(np.float64)
                    else:
                        bindings[v] = reader.doc_values(v).astype(np.float64)
                vals = np.asarray(expr.evaluate(bindings), dtype=np.float64)
                if vals.ndim == 0:
                    vals = np.full(n, float(vals))
                return np.nonzero(vals != 0.0)[0].astype(np.int64)

            docids = _qcache(reader, q, _funcmatch)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, FunctionRangeQuery):
            def _funcrange(q=q):
                from lucene_ray.search.expressions import compile_expression

                expr = compile_expression(q.expression)
                n = reader.doc_count
                bindings = {}
                for v in expr.variables:
                    if v == "_score":
                        raise ValueError(
                            "FunctionRangeQuery has no _score variable "
                            "(no enclosing query)"
                        )
                    elif v == "doc_len":
                        bindings[v] = reader.doc_len.astype(np.float64)
                    else:
                        bindings[v] = reader.doc_values(v).astype(np.float64)
                vals = np.asarray(expr.evaluate(bindings), dtype=np.float64)
                if vals.ndim == 0:
                    vals = np.full(n, float(vals))
                keep = np.ones(n, dtype=bool)
                if q.lower is not None:
                    keep &= vals >= q.lower if q.include_lower else vals > q.lower
                if q.upper is not None:
                    keep &= vals <= q.upper if q.include_upper else vals < q.upper
                return np.nonzero(keep)[0].astype(np.int64)

            docids = _qcache(reader, q, _funcrange)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, None, scored=(docids, scores)))
        elif isinstance(q, (DocValuesTermsQuery, SortedSetDocValuesRangeQuery)):
            docids = _qcache(reader, q, lambda: _dv_filter_docids(reader, q))
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, IndexOrDocValuesQuery):
            # cost rule (IndexOrDocValuesQuery.java scorerSupplier: dv path
            # when the lead cost of the OTHER required clauses is below the
            # index query's own cost): estimate lead from sibling TermQuery
            # dfs, index cost from the wrapped query's df / doc_count
            lead = min(
                (
                    reader.term_stats(o.term)[0]
                    for o in queries
                    if o is not q and isinstance(o, TermQuery)
                ),
                default=None,
            )
            index_cost = (
                reader.term_stats(q.index_query.term)[0]
                if isinstance(q.index_query, TermQuery)
                else reader.doc_count
            )
            use_dv = lead is not None and lead < index_cost
            docids = _qcache(
                reader,
                (q, use_dv),
                lambda: _index_or_dv_docids(reader, q, use_dv),
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, RangeFieldQuery):
            docids = _qcache(
                reader,
                q,
                lambda: reader.range_field_docs(
                    q.field, q.lower, q.upper, q.relation
                ),
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, LatLonBoundingBoxQuery):
            def _bbox_docs(q=q):
                # 1e-4-degree fixed point on both axes (builder
                # _synth_bbox_* encoding); per-axis relation intersect,
                # CROSSES as whole-box intersects - within - contains
                # (LatLonBoundingBox.java newCrossesQuery semantics)
                from lucene_ray.search.spatial import QUANT

                ql = [int(round(q.min_lat * QUANT)), int(round(q.min_lon * QUANT))]
                qh = [int(round(q.max_lat * QUANT)), int(round(q.max_lon * QUANT))]
                axes = (f"{q.field}_lat", f"{q.field}_lon")

                def both(rel):
                    a = reader.range_field_docs(axes[0], ql[0], qh[0], rel)
                    b = reader.range_field_docs(axes[1], ql[1], qh[1], rel)
                    return np.intersect1d(a, b, assume_unique=True)

                if q.relation in ("intersects", "within", "contains"):
                    return both(q.relation)
                if q.relation == "crosses":
                    inter = both("intersects")
                    rest = np.union1d(both("within"), both("contains"))
                    return np.setdiff1d(inter, rest, assume_unique=True)
                raise ValueError(f"unknown bbox relation: {q.relation!r}")

            docids = _qcache(reader, q, _bbox_docs)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, LatLonPolygonQuery):
            docids = _qcache(
                reader,
                q,
                lambda: reader.spatial_polygon(q.field, q.shell, q.holes),
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, LatLonBoxQuery):
            docids = _qcache(
                reader,
                q,
                lambda: reader.spatial_box(
                    q.field, q.lat_lo, q.lat_hi, q.lon_lo, q.lon_hi
                ),
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, Geo3DShapeQuery):
            docids = _qcache(
                reader,
                q,
                lambda: reader.spatial_shape3d(q.field, q.shape),
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, LatLonDistanceQuery):
            docids = _qcache(
                reader,
                q,
                lambda: reader.spatial_distance(q.field, q.lat, q.lon, q.radius_m),
            )
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers.get(q), scored=(docids, scores)))
        elif isinstance(q, ConstantScoreQuery):
            def _const_docids(q=q):
                sub = build_clauses(reader, [q.query], scorers | {q.query: scorers[q]})
                if not sub:
                    return np.array([], dtype=np.int64)
                return np.unique(np.concatenate([c.evaluate()[0] for c in sub]))

            docids = _qcache(reader, q, _const_docids)
            if len(docids) == 0:
                continue
            scores = np.full(len(docids), np.float32(q.boost), dtype=np.float32)
            out.append(_Clause(q, None, scorers[q], scored=(docids, scores)))
        elif isinstance(q, NestedBooleanQuery):
            # parenthesized group with MUST/MUST_NOT structure: evaluate the
            # inner boolean densely, surface it as ONE scored clause
            d, s = _qcache(
                reader, q, lambda q=q: evaluate_boolean(reader, q.to_boolean(), scorers)
            )
            if len(d) == 0:
                continue
            if q.boost != 1.0:
                s = (s * np.float32(q.boost)).astype(np.float32)
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, ToParentBlockJoinQuery):
            d, s = _qcache(
                reader, q, lambda q=q: _block_join(reader, q, scorers)
            )
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif type(q).__name__ == "TermAutomatonQuery":
            from lucene_ray.search.termautomaton import automaton_docids

            def _automaton(q=q):
                d = automaton_docids(reader, q)
                s = np.full(len(d), np.float32(q.boost), dtype=np.float32)
                return d, s

            d, s = _qcache(reader, q, _automaton)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, ToChildBlockJoinQuery):
            d, s = _qcache(
                reader, q, lambda q=q: _child_block_join(reader, q, scorers)
            )
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, ParentChildrenBlockJoinQuery):
            d, s = _qcache(
                reader, q, lambda q=q: _parent_children_join(reader, q, scorers)
            )
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, FeatureQuery):
            def _feature(q=q):
                vals = reader.doc_values(q.field).astype(np.float32)
                docids = np.nonzero(vals > 0)[0].astype(np.int64)
                v = vals[docids]
                if q.function == "saturation":
                    s = np.float32(q.weight) * (v / (v + np.float32(q.pivot)))
                else:  # log
                    s = np.float32(q.weight) * np.log1p(v)
                return docids, s.astype(np.float32)

            d, s = _qcache(reader, q, _feature)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif type(q).__name__ == "PayloadScoreQuery":
            # composable clause form (the standalone float64 twin lives in
            # engine.payload_score_search; this is the scorer-tree path the
            # XML BoostingTermQuery element uses)
            def _payload(q=q):
                empty = (
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.float32),
                )
                seg_d, seg_v = [], []
                for term in q.terms:
                    tp = reader.postings(term)
                    if tp is None:
                        continue
                    if not tp.has_payloads:
                        raise ValueError(
                            "index was built without payloads "
                            "(build_index payload_fn)"
                        )
                    d, v = tp.flat_payloads()
                    seg_d.append(d)
                    seg_v.append(v)
                if not seg_d:
                    return empty
                d = np.concatenate(seg_d)
                v = np.concatenate(seg_v).astype(np.float64)
                order = np.argsort(d, kind="stable")
                d_s, v_s = d[order], v[order]
                starts = np.nonzero(
                    np.concatenate(([True], d_s[1:] != d_s[:-1]))
                )[0]
                docs_u = d_s[starts].astype(np.int64)
                if q.function == "sum":
                    sc = np.add.reduceat(v_s, starts)
                elif q.function == "min":
                    sc = np.minimum.reduceat(v_s, starts)
                elif q.function == "max":
                    sc = np.maximum.reduceat(v_s, starts)
                elif q.function == "avg":
                    cnt = np.diff(np.append(starts, len(d_s))).astype(np.float64)
                    sc = np.add.reduceat(v_s, starts) / cnt
                else:
                    raise ValueError(f"unknown payload function: {q.function}")
                return docs_u, (sc * float(q.boost)).astype(np.float32)

            d, s = _qcache(reader, q, _payload)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, LongDistanceFeatureQuery):
            def _ldf(q=q):
                vals = reader.doc_values(q.field).astype(np.int64)
                docids = np.arange(len(vals), dtype=np.int64)
                # Math.max - Math.min (overflow-safe order of operations)
                dist = np.abs(vals - np.int64(q.origin)).astype(np.float64)
                piv = np.float64(q.pivot_distance)
                s = (np.float64(q.boost) * (piv / (piv + dist))).astype(
                    np.float32
                )
                return docids, s

            d, s = _qcache(reader, q, _ldf)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, GeoDistanceFeatureQuery):
            def _gdf(q=q):
                from lucene_ray.search.spatial import haversine_m

                t = reader._spatial_candidates(
                    q.field, -90.0, 90.0, -180.0, 180.0
                )
                empty = (
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.float32),
                )
                if t is None:
                    return empty
                docids = (
                    t.column("docid").to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                dist = haversine_m(
                    t.column("lat").to_numpy(zero_copy_only=False),
                    t.column("lon").to_numpy(zero_copy_only=False),
                    q.lat, q.lon,
                )
                piv = np.float64(q.pivot_m)
                s = (np.float64(q.boost) * (piv / (piv + dist))).astype(
                    np.float32
                )
                order = np.argsort(docids, kind="stable")
                return docids[order], s[order]

            d, s = _qcache(reader, q, _gdf)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, FunctionScoreQuery):
            # FunctionScoreQuery.java:44 — match set of the wrapped query,
            # score from the compiled formula over (_score, doc values)
            def _fscore(q=q):
                from lucene_ray.search.expressions import compile_expression

                expr = compile_expression(q.expression)
                empty = (
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.float32),
                )
                subs = build_clauses(reader, [q.query], scorers)
                if not subs:
                    return empty
                d, s = subs[0].eval_scores(reader.norm_bytes)
                if len(d) == 0:
                    return empty
                bindings = {}
                for v in expr.variables:
                    if v == "_score":
                        bindings[v] = s.astype(np.float64)
                    elif v == "doc_len":
                        bindings[v] = reader.doc_len[d].astype(np.float64)
                    else:
                        bindings[v] = reader.doc_values(v)[d].astype(np.float64)
                vals = np.asarray(expr.evaluate(bindings), dtype=np.float64)
                if vals.ndim == 0:  # constant formula
                    vals = np.full(len(d), float(vals))
                return d, (np.float64(q.boost) * vals).astype(np.float32)

            d, s = _qcache(reader, q, _fscore)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, CoveringQuery):
            # sandbox/search/CoveringQuery.java:51 / CoveringScorer.java —
            # doc matches iff #matching sub-queries >= max(1, minMatch(doc));
            # score = sum of the matching clauses' scores
            def _covering(q=q):
                from lucene_ray.search.expressions import compile_expression

                empty = (
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.float32),
                )
                subs = build_clauses(reader, list(q.queries), scorers)
                if not subs:
                    return empty
                parts_d, parts_s = [], []
                for c in subs:
                    d, s = c.eval_scores(reader.norm_bytes)
                    parts_d.append(d)
                    parts_s.append(s)
                d = np.concatenate(parts_d)
                if len(d) == 0:
                    return empty
                s = np.concatenate(parts_s).astype(np.float32)
                order = np.argsort(d, kind="stable")
                d, s = d[order], s[order]
                change = np.empty(len(d), dtype=bool)
                change[0] = True
                change[1:] = d[1:] != d[:-1]
                starts = np.nonzero(change)[0]
                uniq = d[starts]
                counts = np.diff(np.append(starts, len(d)))
                summed = np.add.reduceat(s, starts)
                expr = compile_expression(q.min_match_source)
                bindings = {}
                for v in expr.variables:
                    if v == "doc_len":
                        bindings[v] = reader.doc_len[uniq].astype(np.float64)
                    else:
                        bindings[v] = reader.doc_values(v)[uniq].astype(
                            np.float64
                        )
                need = np.asarray(expr.evaluate(bindings), dtype=np.float64)
                if need.ndim == 0:  # constant minimum
                    need = np.full(len(uniq), float(need))
                keep = counts >= np.maximum(need, 1.0)
                return uniq[keep], (
                    np.float32(q.boost) * summed[keep]
                ).astype(np.float32)

            d, s = _qcache(reader, q, _covering)
            if len(d) == 0:
                continue
            out.append(_Clause(q, None, None, scored=(d, s)))
        elif isinstance(q, DisjunctionSumQuery):
            subs = build_clauses(reader, list(q.disjuncts), scorers)
            if not subs:
                continue
            parts_d, parts_s = [], []
            for c in subs:
                d, s = c.eval_scores(reader.norm_bytes)
                parts_d.append(d)
                parts_s.append(s)
            d = np.concatenate(parts_d)
            s = np.concatenate(parts_s).astype(np.float32)
            order = np.argsort(d, kind="stable")
            d, s = d[order], s[order]
            change = np.empty(len(d), dtype=bool)
            change[0] = True
            change[1:] = d[1:] != d[:-1]
            starts = np.nonzero(change)[0]
            summed = np.add.reduceat(s.astype(np.float32), starts)
            out.append(_Clause(q, None, None, scored=(d[starts], summed.astype(np.float32))))
        elif isinstance(q, DisjunctionMaxQuery):
            subs = build_clauses(reader, list(q.disjuncts), scorers)
            if not subs:
                continue
            parts_d, parts_s = [], []
            for c in subs:
                d, s = c.eval_scores(reader.norm_bytes)
                parts_d.append(d)
                parts_s.append(s)
            d = np.concatenate(parts_d)
            s = np.concatenate(parts_s).astype(np.float32)
            order = np.argsort(d, kind="stable")
            d, s = d[order], s[order]
            change = np.empty(len(d), dtype=bool)
            change[0] = True
            change[1:] = d[1:] != d[:-1]
            starts = np.nonzero(change)[0]
            mx = np.maximum.reduceat(s, starts)
            sm = np.add.reduceat(s, starts)
            tie = np.float32(q.tie_breaker)
            final = mx + tie * (sm - mx)
            out.append(_Clause(q, None, None, scored=(d[starts], final.astype(np.float32))))
    return out


def _topk(docids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """top-k by (score desc, docid asc) — HitQueue.java:78-84 tie-break."""
    if len(docids) == 0:
        return docids[:0], scores[:0].astype(np.float32)
    order = np.lexsort((docids, -scores.astype(np.float64)))[:k]
    return docids[order], scores[order].astype(np.float32)


def _canonical_scores(
    clauses: list[_Clause], cand: np.ndarray, norm_bytes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact float32 scores summed in canonical clause order (bit-identical
    between the oracle and the pruned path). Returns (scores, match_count)."""
    total = np.zeros(len(cand), dtype=np.float32)
    matches = np.zeros(len(cand), dtype=np.int32)
    for c in clauses:
        s, m = c.contrib(cand, norm_bytes)
        # adding exact 0.0f for non-matches never perturbs the sum
        total = total + s
        matches += m.astype(np.int32)
    return total, matches


def _candidate_set(reader, bq: BooleanQuery, scorers: dict):
    """Shared boolean doc-set algebra (BooleanWeight candidate computation):
    returns (cand, must_clauses, should_clauses) with live-doc and MUST_NOT
    filtering applied, or None when the segment provably has no hits."""
    must = build_clauses(reader, bq.must, scorers)
    if bq.must and len(must) < len(bq.must):
        # a required clause is absent from this segment -> no hits
        return None
    should = build_clauses(reader, bq.should, scorers)
    must_not = build_clauses(reader, bq.must_not, scorers)

    if bq.must:
        cand = None
        for c in must:
            d, _ = c.evaluate()
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        if cand is None or len(cand) == 0:
            return None
    else:
        if not should:
            return None
        cand = np.unique(np.concatenate([c.evaluate()[0] for c in should]))

    live = getattr(reader, "live_mask", None)
    if live is not None:
        cand = cand[live[cand]]  # tombstoned docs never match (LiveDocs)
    for c in must_not:
        d, _ = c.evaluate()
        cand = cand[~np.isin(cand, d, assume_unique=True)]
    return cand, must, should


def count_segment(reader, bq: BooleanQuery, scorers: dict) -> int:
    """Exact non-scoring hit count (TotalHitCountCollector role,
    search/TotalHitCountCollector.java). Candidate sets are materialized
    docid arrays in this design, so exact counts cost no extra scoring work
    — no 1000-hit approximation threshold is needed."""
    res = _candidate_set(reader, bq, scorers)
    if res is None:
        return 0
    cand, must, should = res
    if len(cand) == 0:
        return 0
    msm = bq.min_should_match
    if should and msm > 0 and (bq.must or msm > 1):
        sm = np.zeros(len(cand), dtype=np.int32)
        for c in should:
            sm += (c.lookup(cand) > 0).astype(np.int32)
        cand = cand[sm >= msm]
    return int(len(cand))


def evaluate_boolean(
    reader, bq: BooleanQuery, scorers: dict
) -> tuple[np.ndarray, np.ndarray]:
    """(matching local docids, float32 scores) of the FULL boolean — the
    shared dense evaluation behind the exhaustive scorer and nested-group
    clauses (a nested BooleanQuery scores as the sum of its matching
    scoring clauses, BooleanWeight.java)."""
    empty = np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    res = _candidate_set(reader, bq, scorers)
    if res is None:
        return empty
    cand, must, should = res
    if len(cand) == 0:
        return empty

    scoring = must + should
    total, matches = _canonical_scores(scoring, cand, reader.norm_bytes)
    if bq.must:
        if bq.min_should_match > 0 and should:
            sm = np.zeros(len(cand), dtype=np.int32)
            for c in should:
                sm += (c.lookup(cand) > 0).astype(np.int32)
            keep = sm >= bq.min_should_match
            cand, total = cand[keep], total[keep]
    else:
        msm = max(1, bq.min_should_match)
        keep = matches >= msm
        cand, total = cand[keep], total[keep]
    return cand, total


def score_segment_exhaustive(
    reader, bq: BooleanQuery, scorers: dict, k: int, after=None
) -> tuple[np.ndarray, np.ndarray, int, bool]:
    """Oracle: dense TAAT over the segment (no pruning). Returns
    (local docids, float32 scores, total_hits, exact) — exact is always
    True here (TotalHits.Relation.EQUAL_TO).

    ``after``: searchAfter keyset ``(score, local_docid)`` — keep only hits
    strictly worse (PagingTopScoreDocCollector semantics,
    search/TopScoreDocCollector.java:104-160)."""
    cand, total = evaluate_boolean(reader, bq, scorers)
    if after is not None:
        a_s, a_d = after
        keep = (total < np.float32(a_s)) | (
            (total == np.float32(a_s)) & (cand > a_d)
        )
        cand, total = cand[keep], total[keep]
    d, s = _topk(cand, total, k)
    return d, s, len(cand), True


def score_segment_pruned(
    reader, bq: BooleanQuery, scorers: dict, k: int, theta: float = 0.0
) -> tuple[np.ndarray, np.ndarray, int, bool]:
    """Block-max MaxScore path. Falls back to the exhaustive path for shapes
    it doesn't prune (required clauses present, minShouldMatch > 1) — the
    scorer-selection logic analog (BooleanWeight.java:221-322).

    Returns (docids, scores, total_hits, exact): ``exact`` is True iff every
    clause was evaluated, so total_hits is the true count; False means docs
    matched only by skipped clauses were never counted and total_hits is a
    lower bound (TotalHits.Relation.GREATER_THAN_OR_EQUAL_TO).

    ``theta`` carries the min-competitive floor across segments
    (TopScoreDocCollector.java:283-320 / MaxScoreAccumulator semantics).
    """
    if bq.must or bq.must_not or bq.min_should_match > 1:
        return score_segment_exhaustive(reader, bq, scorers, k)
    clauses = build_clauses(reader, bq.should, scorers)
    if not clauses:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float32), 0, True

    max_scores = np.array([c.max_score() for c in clauses], dtype=np.float64)
    order = np.argsort(-max_scores, kind="stable")  # eval from strongest

    doc_count = reader.doc_count
    live = getattr(reader, "live_mask", None)
    acc = np.zeros(doc_count, dtype=np.float32)
    in_cand = np.zeros(doc_count, dtype=bool)
    theta = float(theta)
    evaluated: list[int] = []
    j = 0
    while j < len(order):
        rest_bound = float(max_scores[order[j:]].sum()) * (1 + _BOUND_MARGIN)
        if theta > 0 and rest_bound <= theta:
            break  # remaining clauses cannot introduce a competitive doc
        c = clauses[order[j]]
        d, s = c.eval_scores(reader.norm_bytes)
        if live is not None:
            # filter BEFORE the θ floor sees these scores — a tombstoned
            # high scorer must not raise the floor and prune live docs
            m = live[d]
            d, s = d[m], s[m]
        acc[d] += s
        in_cand[d] = True
        evaluated.append(order[j])
        # floor = kth best current partial sum (valid lower bounds)
        cand_scores = acc[in_cand]
        if len(cand_scores) >= k:
            kth = float(np.partition(cand_scores, -k)[-k])
            theta = max(theta, kth)
        j += 1

    cand = np.nonzero(in_cand)[0].astype(np.int64)
    non_essential = [clauses[i] for i in order[j:]]
    if non_essential:
        # refine upper bounds per candidate with per-block maxes, then prune
        ub = acc[cand].astype(np.float64)
        for c in non_essential:
            if c.cursor is not None:
                bms = c.cursor.block_max_scores(c.scorer)
                bi = np.minimum(c.cursor.blocks_for(cand), len(bms) - 1)
                ub += bms[bi]
            else:
                ub += c.max_score()
        keep = ub * (1 + _BOUND_MARGIN) >= theta
        survivors = cand[keep]
    else:
        survivors = cand
        if theta > 0:
            survivors = survivors[
                acc[survivors].astype(np.float64) * (1 + _BOUND_MARGIN) >= theta
            ]

    exact = len(evaluated) == len(clauses)
    if len(survivors) == 0:
        return survivors, np.array([], dtype=np.float32), int(len(cand)), exact
    total, matches = _canonical_scores(clauses, survivors, reader.norm_bytes)
    keep = matches >= 1
    survivors, total = survivors[keep], total[keep]
    d, s = _topk(survivors, total, k)
    return d, s, int(len(cand)), exact
