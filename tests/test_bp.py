"""BP recursive-graph-bisection reordering (ops/bp.py) — permutation
validity, objective improvement, clustering behavior, and end-to-end
index equivalence (misc/index/BPIndexReorderer.java contract)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.ops import bp


def _csr(doc_term_pairs, n_docs):
    d = np.array([p[0] for p in doc_term_pairs], dtype=np.int64)
    t = np.array([p[1] for p in doc_term_pairs], dtype=np.int64)
    return bp._forward_index(d, t, n_docs)


def test_log_gap_cost_known_values():
    # one term in docs {0, 3}: identity cost = log2(1) + log2(3)
    offsets, terms = _csr([(0, 0), (3, 0)], 4)
    ident = np.arange(4)
    assert bp.log_gap_cost(offsets, terms, ident) == pytest.approx(np.log2(3))
    # reorder so the two docs are adjacent: cost = log2(1) + log2(1) = 0
    order = np.array([0, 3, 1, 2])
    assert bp.log_gap_cost(offsets, terms, order) == 0.0


def test_permutation_clusters_topics():
    # two interleaved topics; BP must cut the objective and (mostly)
    # separate them. n is chosen so halves are ODD — a perfectly
    # symmetric 50/50 split leaves every bias at exactly 0 and the
    # gain-vs-iteration stop fires immediately (the reference heuristic
    # has the same cold start; real corpora are never exactly tied)
    n = 250
    pairs = []
    for i in range(n):
        base = 0 if i % 2 == 0 else 3
        pairs += [(i, base), (i, base + 1), (i, base + 2), (i, 6)]  # 6=shared
    offsets, terms = _csr(pairs, n)
    ident = np.arange(n)
    order = bp.bp_permutation(offsets, terms, 7, min_partition_size=8)
    assert sorted(order.tolist()) == list(range(n))
    assert bp.log_gap_cost(offsets, terms, order) < bp.log_gap_cost(
        offsets, terms, ident
    )
    par = order % 2
    flips = int((par[1:] != par[:-1]).sum())
    assert flips < n // 4  # interleaved input had n-1 flips


def test_deterministic():
    n = 128
    rng = np.random.default_rng(42)
    pairs = [(i, int(t)) for i in range(n) for t in rng.integers(0, 20, 5)]
    offsets, terms = _csr(pairs, n)
    a = bp.bp_permutation(offsets, terms, 20)
    b = bp.bp_permutation(offsets, terms, 20)
    assert (a == b).all()


def test_reorder_corpus_end_to_end(tmp_path, ray_session):
    from lucene_ray.index.builder import build_index
    from lucene_ray.search.engine import IndexSearcher

    n = 120
    tbl = pa.table(
        {
            "repo": ["r"] * n,
            "path": [f"f{i}.py" for i in range(n)],
            "commit": ["c"] * n,
            "lang": ["py"] * n,
            "content": [
                ("alpha beta gamma" if i % 2 == 0 else "omega psi chi")
                + " shared"
                for i in range(n)
            ],
        }
    )
    cp = str(tmp_path / "c.parquet")
    pq.write_table(tbl, cp, row_group_size=40)
    out = str(tmp_path / "r.parquet")
    res = bp.bp_reorder_corpus(cp, out, min_doc_freq=2, min_partition_size=8)
    assert res["cost_after"] < res["cost_before"]
    order = res["order"]

    ix_a = str(tmp_path / "ix_a")
    ix_b = str(tmp_path / "ix_b")
    build_index([cp], ix_a)
    build_index([out], ix_b)
    sa, sb = IndexSearcher(ix_a), IndexSearcher(ix_b)
    # new docid of original doc d = position of d in order
    pos = np.empty(n, dtype=np.int64)
    pos[order] = np.arange(n)
    for q in ("alpha", "omega", "shared", "alpha shared"):
        da = sa.search(q, n).docids
        db = sb.search(q, n).docids
        assert sorted(pos[da].tolist()) == sorted(db.tolist()), q
    # reordered postings are cheaper to delta-code
    assert res["cost_after"] <= res["cost_before"]
