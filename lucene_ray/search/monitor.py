"""Percolator / reverse search — the monitor module re-expressed Ray-native.

Spec: `lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:44`
(register MonitorQuery objects, ``match(docs)`` returns which queries match
each incoming document) and `TermFilteredPresearcher.java:62` (index the
queries by their terms so only queries sharing a term with the document are
evaluated — the anti "run every query on every doc" optimization).

Ray-Data shape: the registered query set is small state loaded ONCE per
actor (``PercolatorStage`` below — queries parse in ``__init__``); incoming
documents stream through ``map_batches``. Per batch, the document text
tokenizes once (the shared flat kernel), every query TERM becomes one
vectorized membership bitvector over the batch's docs (dictionary-code
``np.isin`` — no per-doc python loop), and boolean structure combines
bitvectors; only phrase verification touches individual candidate docs.
The presearcher prefilter skips whole queries whose anchor terms don't
appear anywhere in the batch.

Supported query surface (the classic-parser subset the engine's matcher
shares): TermQuery, PhraseQuery (exact + slop), required / prohibited /
optional clauses with minimumShouldMatch. Registered queries are strings
parsed with the same analyzer as the documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.search.query import (
    BooleanQuery,
    PhraseQuery,
    TermQuery,
    parse_query,
)


def _clause_vec(
    q, codes_by_term: dict, n_docs: int, doc_term_rows: dict
) -> np.ndarray:
    """Boolean membership vector over the batch's docs for one clause."""
    if isinstance(q, TermQuery):
        return codes_by_term.get(q.term, np.zeros(n_docs, dtype=bool))
    if isinstance(q, PhraseQuery):
        # candidates must contain every phrase term; positions verified
        # per candidate doc only
        cand = np.ones(n_docs, dtype=bool)
        for t in q.terms:
            cand &= codes_by_term.get(t, np.zeros(n_docs, dtype=bool))
        out = np.zeros(n_docs, dtype=bool)
        for d in np.nonzero(cand)[0]:
            pos_lists = [doc_term_rows[(int(d), t)] for t in q.terms]
            if _phrase_in_doc(pos_lists, q.slop):
                out[d] = True
        return out
    raise TypeError(f"unsupported percolator clause: {type(q).__name__}")


def _phrase_in_doc(pos_lists: list[np.ndarray], slop: int) -> bool:
    """Exact (slop=0): consecutive positions; sloppy: adjusted-position
    span <= slop (the engine's SloppyPhraseMatcher semantics)."""
    if slop == 0:
        base = pos_lists[0]
        hit = np.ones(len(base), dtype=bool)
        for j, pl in enumerate(pos_lists[1:], start=1):
            hit &= np.isin(base + j, pl)
            if not hit.any():
                return False
        return bool(hit.any())
    # sloppy: any alignment whose adjusted positions span within slop
    from itertools import product

    small = [pl.tolist() for pl in pos_lists]
    for combo in product(*small):
        adj = [p - i for i, p in enumerate(combo)]
        if max(adj) - min(adj) <= slop:
            return True
    return False


class Percolator:
    """In-process monitor: register string queries once, match document
    batches. ``match_batch`` is the vectorized kernel PercolatorStage wraps
    for the actor-pool path."""

    def __init__(self, queries: dict[int, str], analyzer=None):
        from lucene_ray.analysis import get_analyzer

        self.analyzer = analyzer or get_analyzer("code")
        self.queries: dict[int, BooleanQuery] = {
            qid: parse_query(q, self.analyzer) for qid, q in queries.items()
        }
        # TermFilteredPresearcher.java:62 — anchor terms per query: a doc
        # batch containing NONE of them cannot match, so the query is
        # skipped outright. Required clauses anchor on any one term; a
        # pure disjunction anchors on all its terms.
        self.anchors: dict[int, set] = {}
        for qid, bq in self.queries.items():
            terms: set = set()
            for q in bq.must or bq.should:
                if isinstance(q, TermQuery):
                    terms.add(q.term)
                elif isinstance(q, PhraseQuery):
                    terms.update(q.terms)
            self.anchors[qid] = terms

    def match_batch(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        row_idx, terms, positions = self.analyzer.tokenize_flat(
            batch.column("text").combine_chunks()
        )
        # one membership bitvector per distinct term present in ANY query
        needed: set = set()
        phrase_terms: set = set()
        for bq in self.queries.values():
            for q in list(bq.must) + list(bq.should) + list(bq.must_not):
                if isinstance(q, TermQuery):
                    needed.add(q.term)
                elif isinstance(q, PhraseQuery):
                    needed.update(q.terms)
                    phrase_terms.update(q.terms)
        codes_by_term: dict = {}
        doc_term_rows: dict = {}
        if len(row_idx):
            d_arr = (
                terms
                if isinstance(terms, pa.DictionaryArray)
                else terms.dictionary_encode()
            )
            vocab = d_arr.dictionary.to_pylist()
            code_of = {t: c for c, t in enumerate(vocab)}
            codes = d_arr.indices.to_numpy(zero_copy_only=False)
            for t in needed:
                c = code_of.get(t)
                if c is None:
                    continue
                mask = codes == c
                vec = np.zeros(n, dtype=bool)
                vec[row_idx[mask]] = True
                codes_by_term[t] = vec
                if t in phrase_terms:
                    for d in np.unique(row_idx[mask]):
                        doc_term_rows[(int(d), t)] = positions[
                            mask & (row_idx == d)
                        ]
        present = set(codes_by_term)
        out_doc, out_q = [], []
        for qid, bq in self.queries.items():
            if not bq.must and not bq.should:
                # pure-negative boolean (e.g. '-slow'): IndexSearcher's
                # empty-positive-clause guard matches NOTHING — mirror it
                # (ADVICE r3; reference: pure MUST_NOT queries match no docs)
                continue
            if self.anchors[qid] and not (self.anchors[qid] & present):
                continue  # presearcher skip
            ok = np.ones(n, dtype=bool)
            for q in bq.must:
                ok &= _clause_vec(q, codes_by_term, n, doc_term_rows)
            if bq.should:
                votes = np.zeros(n, dtype=np.int64)
                for q in bq.should:
                    votes += _clause_vec(q, codes_by_term, n, doc_term_rows)
                need = max(bq.min_should_match, 0 if bq.must else 1)
                ok &= votes >= need
            for q in bq.must_not:
                ok &= ~_clause_vec(q, codes_by_term, n, doc_term_rows)
            hits = np.nonzero(ok)[0]
            out_doc.extend(int(doc_ids[d]) for d in hits)
            out_q.extend([qid] * len(hits))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )


class PercolatorStage:
    """Actor-pool stage: ``map_batches(PercolatorStage,
    fn_constructor_kwargs=dict(queries=...), concurrency=N)`` — queries
    parse once per actor (Monitor.java registration), documents stream."""

    def __init__(self, queries: dict[int, str]):
        self.perc = Percolator(queries)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.perc.match_batch(batch)


def percolate_dataset(ds, queries: dict[int, str], concurrency: int = 2):
    """(doc_id, query_id) matches of every registered query over a
    documents Dataset — Monitor.match as a streaming stage."""
    return ds.map_batches(
        PercolatorStage,
        fn_constructor_kwargs={"queries": queries},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
