"""Segment postings construction and decode (the postings sink/reader).

Logical parity targets:
  - postings sink: codecs/lucene99/Lucene99PostingsWriter.java:198-357
    (term-ordered postings, 128-doc packed blocks, per-block skip/impact data,
    SingletonDocID optimization at finishTerm:357)
  - competitive impacts (block-max metadata):
    codecs/CompetitiveImpactAccumulator.java:29-90 — per block the Pareto
    front of (tf, norm) pairs, a true score upper bound for any
    monotone-in-tf / anti-monotone-in-norm similarity
  - term dictionary: the postings table itself sorted by term, with Parquet
    row-group stats as the prefix index (replaces the FST block-tree,
    codecs/lucene90/blocktree/Lucene90BlockTreeTermsWriter.java:223)
  - postings reader: codecs/lucene99/Lucene99PostingsReader.java:54 — here a
    numpy block decoder with random access via stored block offsets
    (replacing multi-level skip lists, Lucene99SkipWriter.java:48-214)

One segment => one Arrow table, one row per term:

  term:str df:int64 ttf:int64 singleton_docid:int64 singleton_tf:int64
  doc_blob:large_binary tf_blob:large_binary pos_blob:large_binary
  block_last_docid:list<int64>  doc_block_offsets:list<int64>
  impacts:list<list<int64>>     # per block, packed (tf << 8) | norm_byte

docids are segment-local (0..doc_count-1); the segment's global base lives in
the manifest (the DocIDMerger docBase analog, index/DocIDMerger.java:27-43).
All columns are plain Arrow types so the table round-trips Parquet untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.codec.forutil import decode_stream, encode_stream
from lucene_ray.config import BLOCK_SIZE

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("singleton_docid", pa.int64()),
        ("singleton_tf", pa.int64()),
        ("doc_blob", pa.large_binary()),
        ("tf_blob", pa.large_binary()),
        ("pos_blob", pa.large_binary()),
        ("block_last_docid", pa.list_(pa.int64())),
        ("doc_block_offsets", pa.list_(pa.int64())),
        ("impacts", pa.list_(pa.list_(pa.int64()))),
    ]
)


def pareto_impacts(tfs: np.ndarray, norms: np.ndarray) -> list[int]:
    """Pareto-competitive (tf, norm) pairs of one block, packed as
    (tf << 8) | norm. A pair survives if no other pair has tf' >= tf with
    norm' <= norm (CompetitiveImpactAccumulator.java:29-90)."""
    # max tf per distinct norm
    order = np.argsort(norms, kind="stable")
    n_sorted = norms[order]
    t_sorted = tfs[order]
    uniq_norms, starts = np.unique(n_sorted, return_index=True)
    max_tf = np.maximum.reduceat(t_sorted, starts)
    # walk norms ascending; keep entries whose tf strictly exceeds the best
    # tf seen at any smaller-or-equal norm
    out: list[int] = []
    best = -1
    for nm, tf in zip(uniq_norms, max_tf):
        if int(tf) > best:
            best = int(tf)
            out.append((int(tf) << 8) | int(nm))
    return out


def encode_term_postings(
    docids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None,
    norm_bytes: np.ndarray,
) -> dict:
    """Encode one term's postings (docids strictly increasing, segment-local).

    ``positions`` is the concatenated per-doc position list (length == sum(tfs)),
    already delta-encoded per doc by the caller.
    """
    df = len(docids)
    ttf = int(tfs.sum())
    blocks_last = docids[np.minimum(
        np.arange(BLOCK_SIZE - 1, df + BLOCK_SIZE - 1, BLOCK_SIZE), df - 1
    )]
    impacts = []
    for b in range(0, df, BLOCK_SIZE):
        sl = slice(b, min(b + BLOCK_SIZE, df))
        impacts.append(pareto_impacts(tfs[sl], norm_bytes[docids[sl]]))

    if df == 1:
        return {
            "df": 1,
            "ttf": ttf,
            "singleton_docid": int(docids[0]),
            "singleton_tf": int(tfs[0]),
            "doc_blob": b"",
            "tf_blob": b"",
            "pos_blob": b"" if positions is None else encode_stream(positions)[0],
            "block_last_docid": [int(docids[0])],
            "doc_block_offsets": [0],
            "impacts": impacts,
        }

    deltas = np.empty(df, dtype=np.uint32)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:], casting="unsafe")
    doc_blob, doc_offsets = encode_stream(deltas)
    tf_blob, _ = encode_stream(tfs.astype(np.uint32))
    pos_blob = b"" if positions is None else encode_stream(positions)[0]
    return {
        "df": df,
        "ttf": ttf,
        "singleton_docid": -1,
        "singleton_tf": -1,
        "doc_blob": doc_blob,
        "tf_blob": tf_blob,
        "pos_blob": pos_blob,
        "block_last_docid": blocks_last.astype(np.int64).tolist(),
        "doc_block_offsets": doc_offsets.astype(np.int64).tolist(),
        "impacts": impacts,
    }


def build_segment_postings(
    row_idx: np.ndarray,
    terms: pa.Array,
    positions: np.ndarray,
    doc_count: int,
    norm_bytes: np.ndarray,
    with_positions: bool = True,
) -> tuple[pa.Table, dict]:
    """Build a segment postings table from exploded (docid, term, position)
    token arrays (output of ``CodeAnalyzer.tokenize_flat``).

    This is the DWPT-flush analog (index/FreqProxTermsWriter.java:84): the
    in-memory TermsHash accumulation is replaced by one vectorized
    sort + reduceat over the segment's tokens. Runs inside ONE build task —
    the segment is sized (TARGET_DOCS_PER_SEGMENT) so this fits a worker heap.
    """
    if len(row_idx) == 0:
        table = POSTINGS_SCHEMA.empty_table()
        return table, {"doc_count": doc_count, "sum_ttf": 0, "unique_terms": 0}

    dict_arr = terms.dictionary_encode() if not isinstance(terms, pa.DictionaryArray) else terms
    term_ids = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary  # unique terms, order of first appearance

    # global sort: (term_id, docid, position)
    order = np.lexsort((positions, row_idx, term_ids))
    t_sorted = term_ids[order]
    d_sorted = row_idx[order]
    p_sorted = positions[order].astype(np.int64)

    # (term, doc) pair boundaries -> tf per pair
    pair_change = np.empty(len(t_sorted), dtype=bool)
    pair_change[0] = True
    np.logical_or(
        t_sorted[1:] != t_sorted[:-1], d_sorted[1:] != d_sorted[:-1],
        out=pair_change[1:],
    )
    pair_starts = np.nonzero(pair_change)[0]
    tfs = np.diff(np.append(pair_starts, len(t_sorted))).astype(np.int64)
    pair_term = t_sorted[pair_starts]
    pair_doc = d_sorted[pair_starts]

    # per-doc position deltas (first position absolute, then gaps), as in
    # FreqProxTermsWriterPerField.java:84-108 (prox stream delta coding)
    pos_delta = np.empty(len(p_sorted), dtype=np.int64)
    pos_delta[0] = p_sorted[0]
    np.subtract(p_sorted[1:], p_sorted[:-1], out=pos_delta[1:])
    pos_delta[pair_starts] = p_sorted[pair_starts]
    pos_delta = pos_delta.astype(np.uint32)
    pair_pos_offsets = np.append(pair_starts, len(p_sorted))

    # term boundaries over pairs
    term_change = np.empty(len(pair_term), dtype=bool)
    term_change[0] = True
    np.not_equal(pair_term[1:], pair_term[:-1], out=term_change[1:])
    term_starts = np.nonzero(term_change)[0]
    term_ends = np.append(term_starts[1:], len(pair_term))

    # term-order: sort unique terms lexicographically (the term dictionary
    # order, TermsHashPerField.sortTerms:112)
    uniq_term_ids = pair_term[term_starts]
    vocab_np = vocab.to_numpy(zero_copy_only=False)
    term_strings = vocab_np[uniq_term_ids]
    lex = np.argsort(term_strings, kind="stable")

    rows = {k: [] for k in POSTINGS_SCHEMA.names}
    sum_ttf = 0
    for j in lex:
        s, e = term_starts[j], term_ends[j]
        docids = pair_doc[s:e]
        term_tfs = tfs[s:e]
        pos = (
            pos_delta[pair_pos_offsets[s] : pair_pos_offsets[e]]
            if with_positions
            else None
        )
        enc = encode_term_postings(docids, term_tfs, pos, norm_bytes)
        rows["term"].append(str(term_strings[j]))
        for k, v in enc.items():
            rows[k].append(v)
        sum_ttf += enc["ttf"]

    table = pa.table(rows, schema=POSTINGS_SCHEMA)
    stats = {
        "doc_count": int(doc_count),
        "sum_ttf": int(sum_ttf),
        "unique_terms": table.num_rows,
    }
    return table, stats


class TermPostings:
    """Decoded postings of one term in one segment (numpy views)."""

    __slots__ = ("docids", "tfs", "_pos_blob", "_ttf")

    def __init__(self, docids: np.ndarray, tfs: np.ndarray, pos_blob: bytes, ttf: int):
        self.docids = docids
        self.tfs = tfs
        self._pos_blob = pos_blob
        self._ttf = ttf

    def positions(self) -> list[np.ndarray]:
        """Per-doc absolute position arrays (decoded lazily for phrases)."""
        flat = decode_stream(self._pos_blob, self._ttf).astype(np.int64)
        out = []
        start = 0
        for tf in self.tfs:
            deltas = flat[start : start + int(tf)]
            out.append(np.cumsum(deltas))
            start += int(tf)
        return out


def decode_term_postings(row: dict) -> TermPostings:
    """Decode one postings-table row (as a python dict) to arrays."""
    df = int(row["df"])
    if df == 1:
        docids = np.array([row["singleton_docid"]], dtype=np.int64)
        tfs = np.array([row["singleton_tf"]], dtype=np.int64)
    else:
        deltas = decode_stream(row["doc_blob"], df).astype(np.int64)
        docids = np.cumsum(deltas)
        tfs = decode_stream(row["tf_blob"], df).astype(np.int64)
    return TermPostings(docids, tfs, row["pos_blob"], int(row["ttf"]))
