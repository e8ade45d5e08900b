"""CombinedFieldQuery (BM25F over the synthetic combined field) —
sandbox/search/CombinedFieldQuery.java:68 + MultiNormsLeafSimScorer.java:143.

The engine is duel-tested against a brute-force quantized twin that
recomputes everything from the raw corpus: per-field byte4 norms combined
additively (byte4(round(sum w_f * byte4ToInt(norm_f)))), ONE pseudo-term
score per doc (df = max over (term, field) pairs, weighted freq sum), and
the weighted-sum collection stats of mergeCollectionStatistics (:354-372).
Also covers the per-field norms sidecar (format v8): build columns, merge
preservation, and the field_sum_ttf reader surface."""

import glob
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.search.engine import IndexSearcher
from lucene_ray.search.query import BooleanQuery, CombinedFieldQuery, TermQuery
from lucene_ray.search.reader import IndexReader
from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

FIELDS = (("content", 1.0), ("path", 2.0))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("corpus_cfq"))
    write_corpus(d, n_docs=400, n_shards=2, seed=23, row_group_size=128)
    return sorted(glob.glob(d + "/*.parquet"))


@pytest.fixture(scope="module")
def ix(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ix_cfq"))
    build_index(corpus, d, target_docs=128, analyzed_fields=("path",))
    return d


def _streams(corpus):
    an = get_analyzer("code")
    tables = [pq.read_table(p, columns=["content", "path"]) for p in corpus]
    t = pa.concat_tables(tables)
    out = {}
    for col in ("content", "path"):
        arr = t.column(col).combine_chunks().cast(pa.string())
        row_idx, terms, _ = an.tokenize_flat(arr)
        out[col] = (
            np.asarray(row_idx),
            np.asarray(terms.to_pylist(), dtype=object),
        )
    return t.num_rows, out


def _brute_topk(n, streams, terms, k=10, k1=1.2, b=0.75):
    """Quantized twin: byte4 norms per field, additive combine, one
    pseudo-term BM25 score per matched doc, docid tie-break."""
    lens = {
        f: np.bincount(streams[f][0], minlength=n) for f, _w in FIELDS
    }
    norm_b = {f: int_to_byte4(lens[f]) for f, _w in FIELDS}
    df, ttf = 0, 0
    freq = np.zeros(n, dtype=np.float64)
    for t in terms:
        for f, w in FIELDS:
            rows, toks = streams[f]
            tf = np.bincount(rows[toks == t], minlength=n)
            pdf = int((tf > 0).sum())
            if pdf > 0:
                df = max(df, pdf)
                ttf = int(ttf + w * int(tf.sum()))
            freq += w * tf
    if df == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    s_ttf = 0
    for f, w in FIELDS:
        s_ttf = int(s_ttf + w * int(lens[f].sum()))
    avgdl = s_ttf / n
    dl_f = np.zeros(n, dtype=np.float32)
    for f, w in FIELDS:
        dl_f += np.float32(w) * byte4_to_int(norm_b[f]).astype(np.float32)
    dl = byte4_to_int(
        int_to_byte4(np.floor(dl_f + np.float32(0.5)).astype(np.int64))
    ).astype(np.float64)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    score = idf * freq / (freq + k1 * (1 - b + b * dl / avgdl))
    cand = np.nonzero(freq > 0)[0]
    order = np.lexsort((cand, -score[cand]))[:k]
    return cand[order], score[cand[order]].astype(np.float32)


QUERIES = [
    ("merge", "sort"),
    ("doc",),          # path-only token
    ("merge", "doc"),  # cross-field
]


def test_engine_matches_brute_force(ix, corpus):
    n, streams = _streams(corpus)
    s = IndexSearcher(ix)
    for terms in QUERIES:
        q = CombinedFieldQuery(terms=terms, fields=FIELDS)
        td = s.search(BooleanQuery(should=[q]), 10)
        bd, bs = _brute_topk(n, streams, terms)
        assert td.docids.tolist() == bd.tolist(), terms
        np.testing.assert_allclose(td.scores, bs, rtol=2e-6)


def test_pruned_equals_exhaustive(ix):
    s_p = IndexSearcher(ix, pruned=True)
    s_e = IndexSearcher(ix, pruned=False)
    for terms in QUERIES:
        q = CombinedFieldQuery(terms=terms, fields=FIELDS)
        a = s_p.search(BooleanQuery(should=[q]), 10)
        b = s_e.search(BooleanQuery(should=[q]), 10)
        assert a.docids.tolist() == b.docids.tolist()
        np.testing.assert_array_equal(a.scores, b.scores)


def test_composes_in_boolean(ix):
    """CombinedFieldQuery as one clause among others (MUST + MUST_NOT)."""
    s = IndexSearcher(ix)
    q = CombinedFieldQuery(terms=("merge",), fields=FIELDS)
    td_all = s.search(BooleanQuery(must=[q]), 1_000_000)
    td_not = s.search(
        BooleanQuery(must=[q], must_not=[TermQuery("sort")]), 1_000_000
    )
    assert set(td_not.docids) <= set(td_all.docids)
    assert len(td_not.docids) < len(td_all.docids)


def test_weight_below_one_rejected():
    with pytest.raises(ValueError):
        CombinedFieldQuery(terms=("x",), fields=(("content", 0.5),))


def test_absent_terms_empty(ix):
    s = IndexSearcher(ix)
    q = CombinedFieldQuery(terms=("zzzznope",), fields=FIELDS)
    td = s.search(BooleanQuery(should=[q]), 10)
    assert len(td.docids) == 0


def test_per_field_norms_columns(ix, corpus):
    """norms.parquet carries norm_path/doc_len_path; doc_len_path equals
    the per-doc token count of the path column."""
    n, streams = _streams(corpus)
    expect = np.bincount(streams["path"][0], minlength=n)
    r = IndexReader(ix)
    got = np.concatenate([sr.field_norms("path")[1] for sr in r.all_readers()])
    np.testing.assert_array_equal(got, expect)
    nb = np.concatenate([sr.field_norms("path")[0] for sr in r.all_readers()])
    np.testing.assert_array_equal(nb, int_to_byte4(expect))
    assert r.field_sum_ttf("path") == int(expect.sum())
    assert r.field_sum_ttf("content") == r.sum_ttf


def test_merge_preserves_field_norms(ix, corpus, tmp_path_factory):
    """force_merge folds per-field norm columns in doc order (format v8
    merge contract) and search results are unchanged."""
    import shutil

    from lucene_ray.index.merge import force_merge

    d = str(tmp_path_factory.mktemp("ix_cfq_merged"))
    shutil.rmtree(d)
    shutil.copytree(ix, d)
    before = IndexSearcher(ix)
    q = CombinedFieldQuery(terms=("merge", "doc"), fields=FIELDS)
    td_before = before.search(BooleanQuery(should=[q]), 10)
    m = force_merge(d)
    assert len(m.live_segments) == 1
    after = IndexSearcher(d)
    r = IndexReader(d)
    n, streams = _streams(corpus)
    expect = np.bincount(streams["path"][0], minlength=n)
    got = np.concatenate([sr.field_norms("path")[1] for sr in r.all_readers()])
    np.testing.assert_array_equal(got, expect)
    td_after = after.search(BooleanQuery(should=[q]), 10)
    assert td_after.docids.tolist() == td_before.docids.tolist()
    np.testing.assert_array_equal(td_after.scores, td_before.scores)


def test_missing_field_norms_raises(ix):
    s = IndexSearcher(ix)
    q = CombinedFieldQuery(terms=("merge",), fields=(("nosuch", 1.0),))
    with pytest.raises(KeyError):
        s.search(BooleanQuery(should=[q]), 10)
