"""Per-occurrence payload stream (postings .pay lane) + PayloadScoreQuery
(queries/payloads/PayloadScoreQuery.java:43, PayloadFunction.java):
codec roundtrip, builder integration, merge survival, and score parity with
a naive per-doc evaluator."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.codec.postings_codec import (
    build_segment_postings,
    decode_segment_pairs,
    decode_term_postings,
)
from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.search.engine import IndexSearcher, payload_score_search
from lucene_ray.search.query import PayloadScoreQuery


def _tokens(seed=5, n_tokens=600, n_docs=40, vocab=("aa", "bbb", "c", "dddd")):
    rng = np.random.default_rng(seed)
    row = np.sort(rng.integers(0, n_docs, size=n_tokens))
    terms = pa.array(rng.choice(vocab, size=n_tokens), type=pa.string())
    # positions ascending within each doc
    pos = np.zeros(n_tokens, dtype=np.int64)
    for d in range(n_docs):
        m = row == d
        pos[m] = np.arange(m.sum())
    return row.astype(np.int64), terms, pos


def test_codec_roundtrip_payloads():
    row, terms, pos = _tokens()
    n_docs = int(row.max()) + 1
    payloads = np.asarray(
        [len(t) * 10 + (p % 3) for t, p in zip(terms.to_pylist(), pos)],
        dtype=np.uint32,
    )
    norms = np.ones(n_docs, dtype=np.uint8)
    table, _ = build_segment_postings(
        row, terms, pos, n_docs, norms, payloads=payloads
    )
    assert "pay_blob" in table.column_names
    # per-term decode: flat payloads align with flat positions
    want = {}
    for t, d, p, v in zip(terms.to_pylist(), row, pos, payloads):
        want.setdefault(t, []).append((d, p, int(v)))
    for i in range(table.num_rows):
        rowd = {c: table.column(c)[i].as_py() for c in table.column_names}
        tp = decode_term_postings(rowd)
        assert tp.has_payloads
        d_occ, vals = tp.flat_payloads()
        dp, pp = tp.flat_positions()
        got = sorted(zip(d_occ.tolist(), pp.tolist(), vals.tolist()))
        assert got == sorted(want[rowd["term"]])
    # whole-segment decode carries the stream
    out = decode_segment_pairs(table, with_payloads=True)
    assert len(out) == 6
    assert int(out[5].sum()) == int(payloads.sum())


def test_roundtrip_without_payloads_unchanged():
    row, terms, pos = _tokens(seed=7)
    n_docs = int(row.max()) + 1
    table, _ = build_segment_postings(
        row, terms, pos, n_docs, np.ones(n_docs, dtype=np.uint8)
    )
    rowd = {c: table.column(c)[i].as_py() for c in table.column_names for i in [0]}
    tp = decode_term_postings(rowd)
    assert not tp.has_payloads
    d, v = tp.flat_payloads()
    assert len(d) == 0 and len(v) == 0


@pytest.fixture(scope="module")
def pay_ix(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("pay_corpus"))
    write_corpus(corpus, n_docs=300, n_shards=2, seed=13, row_group_size=128)
    ix = str(tmp_path_factory.mktemp("pay_ix"))
    build_index(
        sorted(glob.glob(corpus + "/*.parquet")),
        ix,
        target_docs=80,
        payload_fn="term_length",
    )
    return ix


def _naive_scores(ix, terms, fn):
    import pyarrow.parquet as pq

    from lucene_ray.analysis import get_analyzer
    from lucene_ray.search.engine import IndexSearcher

    s = IndexSearcher(ix)
    an = get_analyzer(s.reader.manifest.analyzer)
    docs = []
    for e in s.reader.segments:
        t = pq.ParquetFile(e.input["file"]).read_row_groups(
            list(range(e.input["rg_start"], e.input["rg_end"])),
            columns=["content"],
        )
        docs.extend(an.tokenize_text(x) for x in t.column("content").to_pylist())
    out = {}
    for d, toks in enumerate(docs):
        vals = [len(t) for t in toks if t in terms]
        if not vals:
            continue
        out[d] = {
            "sum": float(sum(vals)),
            "min": float(min(vals)),
            "max": float(max(vals)),
            "avg": sum(vals) / float(len(vals)),
        }[fn]
    return out


@pytest.mark.parametrize("fn", ["sum", "min", "max", "avg"])
def test_payload_score_matches_naive(pay_ix, fn):
    s = IndexSearcher(pay_ix)
    terms = ("merge", "flush")
    td = payload_score_search(s, PayloadScoreQuery(terms, fn))
    want = _naive_scores(pay_ix, set(terms), fn)
    got = dict(zip(td.docids.tolist(), td.scores.tolist()))
    assert got == want
    # ordering contract: score desc, docid asc
    keys = list(zip([-x for x in td.scores.tolist()], td.docids.tolist()))
    assert keys == sorted(keys)


def test_payloads_survive_merge(pay_ix, tmp_path_factory):
    import shutil

    from lucene_ray.index.merge import TieredMergePolicy, maybe_merge

    d = str(tmp_path_factory.mktemp("pay_merged"))
    shutil.rmtree(d)
    shutil.copytree(pay_ix, d)
    maybe_merge(d, TieredMergePolicy(), use_ray=False)
    s = IndexSearcher(d)
    td = payload_score_search(s, PayloadScoreQuery(("merge",), "sum"))
    want = _naive_scores(d, {"merge"}, "sum")
    assert dict(zip(td.docids.tolist(), td.scores.tolist())) == want


def test_payload_requires_indexed_stream(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("nopay_corpus"))
    write_corpus(corpus, n_docs=60, n_shards=1, seed=3, row_group_size=64)
    ix = str(tmp_path_factory.mktemp("nopay_ix"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), ix, target_docs=60)
    s = IndexSearcher(ix)
    with pytest.raises(ValueError, match="payload"):
        payload_score_search(s, PayloadScoreQuery(("merge",), "sum"))


def test_unknown_payload_fn_rejected(tmp_path_factory, ray_session):
    with pytest.raises(ValueError, match="payload_fn"):
        build_index(["/nonexistent.parquet"], "/tmp/x", payload_fn="nope")
