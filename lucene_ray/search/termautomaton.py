"""TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java): a token
automaton matched against consecutive token positions — the generalization
of phrase / multi-phrase / graph queries. Build with createState /
setAccept / addTransition(term or ANY) / finish, mirroring the reference's
builder surface; ``ANY`` (term=None) matches any single token.

Evaluation (TermAutomatonScorer's posting-synced DP, re-expressed): per
segment, candidate docs are the union of the term transitions' postings —
valid because finish() enforces the reference's "automaton cannot lead
with an ANY transition" rule (TermAutomatonQuery.java:157), so every
accepting path touches ≥1 term edge, and also cannot END with ANY (:167).
For each candidate, a state-set bitmask DP walks its positions: the start
state re-injects at every position (a match may begin anywhere), term
edges fire where that term has an occurrence, ANY edges always fire. The
DP is O(doc_len * edges) per candidate with numpy position masks — the
same per-doc cost shape as the reference's scorer; at scale it runs
per-segment inside the searcher like any positional query.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class TermAutomatonQuery:
    """``transitions``: tuple of (from_state, to_state, term|None) — None is
    the ANY transition. State 0 is the start state. Built via
    TermAutomatonBuilder ordinarily; frozen so the per-reader query cache
    can key it."""

    n_states: int
    transitions: tuple  # ((frm, to, term|None), ...)
    accept_states: tuple
    boost: float = 1.0

    def term_set(self) -> list[str]:
        return sorted({t for _f, _t2, t in self.transitions if t is not None})


class TermAutomatonBuilder:
    """createState/setAccept/addTransition/finish
    (TermAutomatonQuery.java:98-138)."""

    def __init__(self):
        self._n = 0
        self._accept = set()
        self._edges = []

    def create_state(self) -> int:
        s = self._n
        self._n += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def add_transition(self, source: int, dest: int, term: str | None) -> None:
        """term=None is addAnyTransition (TermAutomatonQuery.java:118)."""
        self._edges.append((source, dest, term))

    def finish(self) -> TermAutomatonQuery:
        if not self._accept:
            raise ValueError("automaton has no accept states")
        # reference contract: no leading/trailing ANY (java:157,167)
        out_of_start = [t for f, _to, t in self._edges if f == 0]
        if out_of_start and all(t is None for t in out_of_start):
            raise ValueError("automaton cannot lead with an ANY transition")
        into_accept = [t for _f, to, t in self._edges if to in self._accept]
        if into_accept and all(t is None for t in into_accept):
            raise ValueError("automaton cannot end with an ANY transition")
        return TermAutomatonQuery(
            self._n, tuple(self._edges), tuple(sorted(self._accept))
        )


def token_stream_to_automaton(
    terms: list[str], positions: list[int]
) -> TermAutomatonQuery:
    """TokenStreamToTermAutomatonQuery (sandbox/search/
    TokenStreamToTermAutomatonQuery.java:59-99): convert an analyzed token
    stream — including posInc==0 graph tokens (synonyms) — into a
    TermAutomatonQuery. State i = position i; every token at position p
    adds a (p, p+1, term) transition, so synonym alternatives at one
    position become parallel edges; accept = the final position state.
    (Single-position tokens only: endOffset graphs beyond width 1 are the
    reference's multi-position case, out of scope here.)"""
    if not terms:
        raise ValueError("empty token stream")
    b = TermAutomatonBuilder()
    n_pos = max(positions) + 1
    for _ in range(n_pos + 1):
        b.create_state()
    for t, p in zip(terms, positions):
        b.add_transition(int(p), int(p) + 1, t)
    b.set_accept(n_pos)
    return b.finish()


def automaton_docids(reader, q: TermAutomatonQuery) -> np.ndarray:
    """Segment-local matching docids for a TermAutomatonQuery."""
    # gather involved term postings once
    term_post = {}
    for term in q.term_set():
        tp = reader.postings(term)
        if tp is not None:
            term_post[term] = tp
    if not term_post:
        return np.array([], dtype=np.int64)
    # candidates = union of term postings docs (no leading-ANY rule)
    cand = np.unique(np.concatenate([tp.docids for tp in term_post.values()]))
    live = getattr(reader, "live_mask", None)
    if live is not None:
        cand = cand[live[cand]]
    if len(cand) == 0:
        return cand.astype(np.int64)
    doc_lens = reader.doc_len
    accept_mask = 0
    for s in q.accept_states:
        accept_mask |= 1 << s
    start_mask = 1
    # per-term per-doc position lists for the candidate docs
    # (positions() yields occurrence positions aligned with docids)
    per_term_positions = {}
    for term, tp in term_post.items():
        d, p = tp.flat_positions()
        per_term_positions[term] = (d, p)
    out = []
    for doc in cand.tolist():
        dlen = int(doc_lens[doc])
        if dlen == 0:
            continue
        # boolean occurrence mask per term over this doc's positions
        occ = {}
        for term, (d, p) in per_term_positions.items():
            lo = int(np.searchsorted(d, doc, side="left"))
            hi = int(np.searchsorted(d, doc, side="right"))
            if hi > lo:
                m = np.zeros(dlen, dtype=bool)
                pos = p[lo:hi]
                m[pos[pos < dlen]] = True
                occ[term] = m
        active = start_mask
        matched = False
        for pos in range(dlen):
            nxt = 0
            for frm, to, term in q.transitions:
                if not (active >> frm) & 1:
                    continue
                if term is None or (term in occ and occ[term][pos]):
                    nxt |= 1 << to
            if nxt & accept_mask:
                matched = True
                break
            active = nxt | start_mask
        if matched:
            out.append(doc)
    return np.asarray(out, dtype=np.int64)
