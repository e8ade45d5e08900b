"""Recursive-graph-bisection doc reordering (BP) — the misc module's
BPIndexReorderer (misc/index/BPIndexReorderer.java; algorithm from
Dhulipala et al., "Compressing Graphs and Inverted Indexes with Recursive
Graph Bisection", KDD 2016, with the Mackenzie et al. "Tradeoff Options
for Bipartite Graph Partitioning" gain-vs-iteration stop).

Reordering docids so co-occurring docs are adjacent shrinks delta-coded
postings (sum of log2 doc gaps) and clusters similar docs — at 100 TB
that is a direct index-size and query-locality win.

Shape here:
  - tokenization is DISTRIBUTED (map_batches over the corpus, partial
    per-batch doc->term-set rows);
  - the bisection itself holds the df-filtered forward index in memory,
    exactly like the reference ("O(maxDoc + numTerms) memory, slow
    operation"), and is meant to run per SHARD of a sharded corpus —
    the permutation problem does not decompose across machines, the
    shards do (scale contract documented on bp_reorder_corpus);
  - docs move as whole rows: the output is a PERMUTED corpus parquet
    that build_index consumes normally (the reference reorders through a
    CodecReader view + addIndexes; same effect).

Divergences, documented: per-iteration biases use float64 log2 (not the
reference's 256-entry fastLog2 table), and side doc-frequencies update
once per iteration (vectorized) rather than per swap; both sides of the
trade only affect which LOCAL optimum the heuristic lands in — the
quality contract (log-gap cost strictly improves on clusterable corpora,
permutation validity) is pinned by tests/test_bp.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

DEFAULT_MIN_DOC_FREQ = 4096  # BPIndexReorderer.DEFAULT_MIN_DOC_FREQ
DEFAULT_MIN_PARTITION_SIZE = 32
DEFAULT_MAX_ITERS = 20


def _forward_index(row_idx: np.ndarray, term_ids: np.ndarray, n_docs: int):
    """CSR doc->terms from a (doc, term_id) postings stream (one entry
    per UNIQUE (doc, term))."""
    order = np.lexsort((term_ids, row_idx))
    r, t = row_idx[order], term_ids[order]
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (t[1:] != t[:-1])
    r, t = r[keep], t[keep]
    counts = np.bincount(r, minlength=n_docs)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return offsets, t.astype(np.int64)


def bp_permutation(
    offsets: np.ndarray,
    terms: np.ndarray,
    n_terms: int,
    *,
    min_partition_size: int = DEFAULT_MIN_PARTITION_SIZE,
    max_iters: int = DEFAULT_MAX_ITERS,
    seed_docs: np.ndarray | None = None,
) -> np.ndarray:
    """new_order[i] = original doc at output position i. ``offsets``/
    ``terms`` = CSR forward index over df-filtered term ids."""
    n_docs = len(offsets) - 1
    docs = (
        np.arange(n_docs, dtype=np.int64)
        if seed_docs is None
        else seed_docs.astype(np.int64)
    )
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)

    def doc_terms(sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(rep, term) pairs for the selected docs: vectorized CSR range
        gather — flat positions = repeat(start) + intra-run arange."""
        ln = lens[sel]
        total = int(ln.sum())
        if total == 0:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        rep = np.repeat(np.arange(len(sel), dtype=np.int64), ln)
        run0 = np.repeat(np.cumsum(ln) - ln, ln)
        idx = np.repeat(offsets[sel], ln) + (np.arange(total) - run0)
        return rep, terms[idx]

    def bisect(lo: int, hi: int) -> None:
        n = hi - lo
        if n < max(2, min_partition_size):
            return
        mid = lo + n // 2
        for it in range(max_iters):
            seg = docs[lo:hi]
            rep, tt = doc_terms(seg)
            side = (np.arange(n) >= (mid - lo)).astype(np.int64)
            df = np.zeros((2, n_terms), dtype=np.int64)
            np.add.at(df, (side[rep], tt), 1)
            with np.errstate(divide="ignore"):
                l2 = np.where(df > 0, np.log2(np.maximum(df, 1)), 0.0)
            # bias of doc d on side s = sum_t log2(df_other) - log2(df_own)
            contrib = l2[1 - side[rep], tt] - l2[side[rep], tt]
            bias = np.zeros(n, dtype=np.float64)
            np.add.at(bias, rep, contrib)
            left_n = mid - lo
            bl, br = bias[:left_n], bias[left_n:]
            # docs most attracted to the other side first (tie: docid asc)
            ol = np.lexsort((seg[:left_n], -bl))
            orr = np.lexsort((seg[left_n:], -br))
            m = min(len(ol), len(orr))
            gains = bl[ol[:m]] + br[orr[:m]]
            # Mackenzie stop: swap while combined gain > iteration index
            k = int(np.searchsorted(-gains, -float(it), side="left"))
            if k == 0:
                break
            li, ri = ol[:k], orr[:k] + left_n
            tmp = seg[li].copy()
            seg[li] = seg[ri]
            seg[ri] = tmp
            docs[lo:hi] = seg
        bisect(lo, mid)
        bisect(mid, hi)

    bisect(0, n_docs)
    return docs


def log_gap_cost(offsets: np.ndarray, terms: np.ndarray, order: np.ndarray) -> float:
    """Sum over terms of log2(gap) between consecutive postings under the
    docid assignment ``order`` (the objective BP minimizes)."""
    n_docs = len(offsets) - 1
    pos_of = np.empty(n_docs, dtype=np.int64)
    pos_of[order] = np.arange(n_docs)
    lens = offsets[1:] - offsets[:-1]
    rep = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    new_doc = pos_of[rep]
    o = np.lexsort((new_doc, terms))
    t_s, d_s = terms[o], new_doc[o]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = t_s[1:] != t_s[:-1]
    gaps = np.where(first, d_s + 1, np.concatenate(([1], np.diff(d_s))))
    return float(np.log2(gaps).sum())


def corpus_forward_index(
    corpus_path: str,
    analyzer_name: str = "code",
    min_doc_freq: int = 2,
    text_column: str = "content",
):
    """Distributed tokenize -> df-filtered CSR forward index. Per-batch
    map_batches emits (doc, term) pairs for UNIQUE per-doc terms; the
    driver concatenates pair columns (O(filtered postings) — the
    reference's memory contract)."""
    from lucene_ray.analysis import get_analyzer

    def pairs(batch: pa.Table) -> pa.Table:
        an = get_analyzer(analyzer_name)
        row_idx, tt, _pos = an.tokenize_flat(
            batch.column(text_column).combine_chunks()
        )
        base = batch.column("__row0").to_numpy(zero_copy_only=False)[0]
        # unique (doc, term) within the batch
        tb = pa.table(
            {
                "doc": pa.array(row_idx.astype(np.int64) + base),
                "term": tt,
            }
        )
        return tb.group_by(["doc", "term"]).aggregate([])

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(corpus_path)
    n_docs = pf.metadata.num_rows
    # row-group-aligned batches with a global row offset column
    start = 0
    ds_rows = []
    for rg in range(pf.metadata.num_row_groups):
        nr = pf.metadata.row_group(rg).num_rows
        ds_rows.append({"rg": rg, "row0": start})
        start += nr

    def run(batch: pa.Table) -> pa.Table:
        out = []
        for rg, row0 in zip(
            batch.column("rg").to_pylist(), batch.column("row0").to_pylist()
        ):
            t = pq.ParquetFile(corpus_path).read_row_group(
                rg, columns=[text_column]
            )
            t = t.append_column(
                "__row0", pa.array([row0] * t.num_rows, type=pa.int64())
            )
            out.append(pairs(t))
        return pa.concat_tables(out)

    res = (
        ray.data.from_items(ds_rows)
        .map_batches(run, batch_format="pyarrow", batch_size=1)
        .to_arrow_refs()
    )
    parts = [ray.get(r) for r in res]
    allp = pa.concat_tables(parts)
    doc = allp.column("doc").to_numpy(zero_copy_only=False).astype(np.int64)
    enc = allp.column("term").combine_chunks().dictionary_encode()
    tid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_ids = len(enc.dictionary)
    # df filter (DEFAULT_MIN_DOC_FREQ, caller-scaled for small shards)
    df = np.bincount(tid, minlength=n_ids)
    keep_term = df >= min_doc_freq
    keep = keep_term[tid]
    doc, tid = doc[keep], tid[keep]
    # compact ids
    remap = -np.ones(n_ids, dtype=np.int64)
    kept = np.nonzero(keep_term)[0]
    remap[kept] = np.arange(len(kept))
    tid = remap[tid]
    offsets, terms = _forward_index(doc, tid, n_docs)
    return offsets, terms, len(kept), n_docs


def bp_reorder_corpus(
    corpus_path: str,
    out_path: str,
    analyzer_name: str = "code",
    min_doc_freq: int = 2,
    text_column: str = "content",
    row_group_size: int | None = None,
    **bp_kwargs,
) -> dict:
    """Reorder one corpus shard's rows by BP and write the permuted
    parquet (build_index on the output assigns the new docids). Returns
    {n_docs, cost_before, cost_after, order}. Scale contract: run per
    shard — the in-memory bisection is per-shard exactly like the
    reference's per-reader reorder; shards stream independently."""
    import pyarrow.parquet as pq

    offsets, terms, n_terms, n_docs = corpus_forward_index(
        corpus_path, analyzer_name, min_doc_freq, text_column
    )
    ident = np.arange(n_docs, dtype=np.int64)
    before = log_gap_cost(offsets, terms, ident)
    order = bp_permutation(offsets, terms, n_terms, **bp_kwargs)
    after = log_gap_cost(offsets, terms, order)
    if after > before:
        # the heuristic never ships a worse assignment than the input
        order, after = ident, before
    t = pq.read_table(corpus_path)
    pq.write_table(
        t.take(pa.array(order)), out_path,
        row_group_size=row_group_size or t.num_rows,
    )
    return {
        "n_docs": n_docs,
        "cost_before": before,
        "cost_after": after,
        "order": order,
    }


def bp_reorder(sf_dir: str) -> pa.Table:
    """Gate: BP-reorder the documents shard and report the objective.
    Rows-only by design (the permutation itself is the output of a
    heuristic no SQL reproduces; validity + quality are pinned by
    tests/test_bp.py): one row — (n_docs, improved, cost_before,
    cost_after, order_sha) with the permutation fingerprinted for
    determinism tracking."""
    import hashlib
    import os

    from lucene_ray.index.corpus import documents_as_corpus

    corpus = documents_as_corpus(sf_dir)
    out = os.path.join(
        "/tmp/lucene_ray_cache",
        "bp_" + hashlib.sha1(sf_dir.encode()).hexdigest()[:12] + ".parquet",
    )
    res = bp_reorder_corpus(corpus, out, min_doc_freq=2)
    sha = hashlib.sha256(res["order"].tobytes()).hexdigest()[:16]
    return pa.table(
        {
            "n_docs": pa.array([res["n_docs"]], type=pa.int64()),
            "improved": pa.array(
                [int(res["cost_after"] < res["cost_before"])], type=pa.int64()
            ),
            "cost_before": pa.array([res["cost_before"]], type=pa.float64()),
            "cost_after": pa.array([res["cost_after"]], type=pa.float64()),
            "order_sha": pa.array([sha], type=pa.string()),
        }
    )
