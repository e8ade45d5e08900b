"""Analyzed parallel fields + FieldMaskingSpanQuery
(queries/spans/FieldMaskingSpanQuery.java:36; builder analyzed_fields with
ANALYZED_FIELD_DERIVERS — the ReverseStringFilter-style position-aligned
"rev" field — and independent source-column analyzed fields)."""

import glob

import numpy as np
import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.search.engine import IndexSearcher
from lucene_ray.search.query import (
    BooleanQuery,
    FieldMaskingSpanQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, n_docs=400, n_shards=2, seed=11, row_group_size=128)
    return sorted(glob.glob(d + "/*.parquet"))


@pytest.fixture(scope="module")
def ix(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ix_af"))
    build_index(corpus, d, target_docs=128,
                analyzed_fields=("rev", "path"))
    return d


@pytest.fixture(scope="module")
def plain_ix(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ix_plain"))
    build_index(corpus, d, target_docs=128)
    return d


def _mask(term: str):
    return FieldMaskingSpanQuery(SpanTermQuery(term[::-1], field="rev"), "content")


def test_rev_field_positions_mirror_content(ix, corpus):
    """rev:reverse(t) postings == t's content postings (docids, tfs AND
    positions) for every analyzed term — the derived field shares the
    content stream's layout exactly."""
    import pyarrow.parquet as pq

    from lucene_ray.search.reader import IndexReader

    r = IndexReader(ix)
    an = get_analyzer("code")
    for e in r.segments[:1]:
        sr = r.segment_reader(e.name)
        t = pq.ParquetFile(e.input["file"]).read_row_groups(
            list(range(e.input["rg_start"], e.input["rg_end"])),
            columns=["content"],
        )
        toks = [an.tokenize_text(x) for x in t.column("content").to_pylist()]
        vocab = sorted({w for row in toks for w in row})[:25]
        for term in vocab:
            p = sr.postings(term)
            q = sr.postings("rev:" + term[::-1])
            assert q is not None, term
            np.testing.assert_array_equal(p.docids, q.docids)
            np.testing.assert_array_equal(p.tfs, q.tfs)
            dp, pp = p.flat_positions()
            dq, pq_ = q.flat_positions()
            np.testing.assert_array_equal(pp, pq_)
            np.testing.assert_array_equal(dp, dq)


def test_source_column_field_tokenized_independently(ix):
    """A non-deriver analyzed field reads its source column and tokenizes
    it in its own position space (path "src/xxx/yyy.py" -> tokens at
    positions 0..k)."""
    import pyarrow.parquet as pq

    from lucene_ray.search.reader import IndexReader

    r = IndexReader(ix)
    an = get_analyzer("code")
    e = r.segments[0]
    sr = r.segment_reader(e.name)
    t = pq.ParquetFile(e.input["file"]).read_row_groups(
        list(range(e.input["rg_start"], e.input["rg_end"])), columns=["path"]
    )
    paths = t.column("path").to_pylist()
    # naive oracle for one common path token
    tok0 = an.tokenize_text(paths[0])[0]
    want_docs = [
        i for i, p in enumerate(paths) if tok0 in an.tokenize_text(p)
    ]
    got = sr.postings("path:" + tok0)
    assert got is not None
    assert got.docids.tolist() == want_docs
    # positions are the token's index within the tokenized PATH
    d, pos = got.flat_positions()
    for doc, p in zip(d.tolist(), pos.tolist()):
        assert an.tokenize_text(paths[doc])[p] == tok0


def test_norms_and_ttf_stay_content_only(ix, plain_ix):
    """Analyzed-field tokens must not leak into norms/doc_len/sum_ttf
    (avgdl is content-only, like keyword fields)."""
    from lucene_ray.search.reader import IndexReader

    ra, rp = IndexReader(ix), IndexReader(plain_ix)
    assert ra.sum_ttf == rp.sum_ttf
    for ea, ep in zip(ra.segments, rp.segments):
        np.testing.assert_array_equal(
            ra.segment_reader(ea.name).doc_len,
            rp.segment_reader(ep.name).doc_len,
        )


def test_checkindex_clean(ix):
    from lucene_ray.index.checkindex import check_index

    res = check_index(ix)
    assert res["ok"], res["problems"]


def test_masked_near_equals_content_near(ix):
    """The masked cross-field join must reproduce the content-only join
    exactly — same doc sets AND scores (rev:reverse(t) carries identical
    df/ttf/positions, and norms are shared)."""
    s = IndexSearcher(ix)
    for t0, t1, slop, ordered in [
        ("merge", "sort", 0, True),
        ("sort", "merge", 3, True),
        ("batch", "window", 5, False),
    ]:
        direct = s.search(
            BooleanQuery(should=[SpanNearQuery(
                (SpanTermQuery(t0), SpanTermQuery(t1)), slop, ordered)]),
            10_000,
        )
        masked = s.search(
            BooleanQuery(should=[SpanNearQuery(
                (SpanTermQuery(t0), _mask(t1)), slop, ordered)]),
            10_000,
        )
        assert direct.docids.tolist() == masked.docids.tolist(), (t0, t1)
        np.testing.assert_array_equal(direct.scores, masked.scores)
        # fully-masked variant: both clauses on the rev field, masked back
        both = s.search(
            BooleanQuery(should=[SpanNearQuery(
                (_mask(t0), _mask(t1)), slop, ordered)]),
            10_000,
        )
        assert direct.docids.tolist() == both.docids.tolist()


def test_mixed_field_composites_raise(ix):
    """Lucene's 'Clauses must have same field' contract
    (SpanNearQuery.java:141 / SpanOrQuery.java:51) without masking."""
    s = IndexSearcher(ix)
    bad_near = SpanNearQuery(
        (SpanTermQuery("merge"), SpanTermQuery("tros", field="rev")), 0, True
    )
    with pytest.raises(ValueError, match="same field"):
        s.search(BooleanQuery(should=[bad_near]), 10)
    bad_or = SpanOrQuery(
        (SpanTermQuery("merge"), SpanTermQuery("egrem", field="rev"))
    )
    with pytest.raises(ValueError, match="same field"):
        s.search(BooleanQuery(should=[bad_or]), 10)
    # masking the stray clause makes the same shapes legal
    ok_near = SpanNearQuery((SpanTermQuery("merge"), _mask("sort")), 0, True)
    s.search(BooleanQuery(should=[ok_near]), 10)


def test_merge_preserves_analyzed_fields(ix, tmp_path_factory, corpus):
    """forceMerge folds the per-occurrence streams; rev-field postings
    (with their real positions) must survive the k-way merge."""
    import shutil

    from lucene_ray.index.merge import force_merge
    from lucene_ray.search.reader import IndexReader

    d = str(tmp_path_factory.mktemp("ix_af_merge"))
    shutil.rmtree(d)
    shutil.copytree(ix, d)
    force_merge(d, use_ray=False)
    r = IndexReader(d)
    assert len([e for e in r.segments if not e.deleted]) == 1
    s = IndexSearcher(d)
    direct = s.search(
        BooleanQuery(should=[SpanNearQuery(
            (SpanTermQuery("merge"), SpanTermQuery("sort")), 0, True)]),
        10_000,
    )
    masked = s.search(
        BooleanQuery(should=[SpanNearQuery(
            (SpanTermQuery("merge"), _mask("sort")), 0, True)]),
        10_000,
    )
    assert direct.docids.tolist() == masked.docids.tolist()
    from lucene_ray.index.checkindex import check_index

    assert check_index(d)["ok"]


def test_options_record_analyzed_fields(ix):
    from lucene_ray.search.reader import IndexReader

    e = IndexReader(ix).segments[0]
    assert e.input["options"]["analyzed_fields"] == ["rev", "path"]


def test_field_name_with_colon_rejected(corpus, tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("ix_bad"))
    with pytest.raises(ValueError, match="':'"):
        build_index(corpus, d, analyzed_fields=("a:b",))


def test_parser_field_scopes_analyzed_fields(ix):
    """Classic-parser field scoping over a non-keyword analyzed field
    (QueryParser.java:84): rev:term / rev:"phrase" / rev:wild* / rev:(...)
    resolve to 'rev:'-prefixed terms with real positions."""
    from lucene_ray.search.query import (
        PhraseQuery,
        TermQuery,
        WildcardQuery,
        parse_query,
    )

    an = get_analyzer("code")
    bq = parse_query("rev:egrem", an)
    assert [t.term for t in bq.should] == ["rev:egrem"]
    bq = parse_query('rev:"tros egrem"', an)
    (pq,) = bq.should
    assert isinstance(pq, PhraseQuery) and pq.terms == ("rev:tros", "rev:egrem")
    bq = parse_query("rev:egr*", an)
    (wq,) = bq.should
    assert isinstance(wq, WildcardQuery) and wq.pattern == "rev:egr*"
    bq = parse_query("rev:(tros hctab)", an)
    inner = bq.should[0]
    terms = {
        t.term
        for t in (getattr(inner, "should", None) or getattr(inner, "disjuncts"))
    }
    assert terms == {"rev:tros", "rev:hctab"}


def test_field_phrase_equals_content_phrase(ix):
    """rev:"tros egrem" (parser) == content phrase "sort merge" — identical
    doc sets through the real positional join on the parallel field."""
    s = IndexSearcher(ix)
    a = s.search('"sort merge"', 10_000)
    b = s.search('rev:"tros egrem"', 10_000)
    assert a.docids.tolist() == b.docids.tolist()
