"""MemoryIndex (memory/.../MemoryIndex.java): single-doc scoring semantics,
engine doc-set agreement, and SQL parity of the gate."""

import duckdb
import pytest

from lucene_ray.search.memoryindex import MemoryIndex
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

SF = "/root/testdata/sf0.001"


def _mi(text="the quick brown fox jumps over the lazy dog", **fields):
    mi = MemoryIndex()
    mi.add_field("content", text)
    for k, v in fields.items():
        mi.add_field(k, v, keyword=True)
    return mi


def test_term_scores_positive_and_absent_zero():
    mi = _mi()
    assert mi.search("fox") > 0.0
    assert mi.search("wolf") == 0.0
    # tf saturation: repeated term scores higher, bounded by (k1+1)*idf
    lo = _mi("fox").search("fox")
    hi = _mi("fox fox fox").search("fox")
    assert hi > lo


def test_boolean_and_msm():
    mi = _mi()
    assert mi.search("fox AND dog") > 0.0
    assert mi.search("fox AND wolf") == 0.0
    assert mi.search("+fox -dog") == 0.0
    assert mi.search(BooleanQuery(
        should=[TermQuery("fox"), TermQuery("wolf"), TermQuery("dog")],
        min_should_match=2,
    )) > 0.0
    assert mi.search(BooleanQuery(
        should=[TermQuery("fox"), TermQuery("wolf"), TermQuery("cat")],
        min_should_match=2,
    )) == 0.0
    # pure-negative matches nothing (engine guard parity)
    assert mi.search(BooleanQuery(must_not=[TermQuery("wolf")])) == 0.0


def test_phrase_and_slop():
    mi = _mi()
    assert mi.search(BooleanQuery(should=[PhraseQuery(("quick", "brown"))])) > 0.0
    assert mi.search(BooleanQuery(should=[PhraseQuery(("brown", "quick"))])) == 0.0
    assert mi.search(BooleanQuery(
        should=[PhraseQuery(("brown", "quick"), slop=2)]
    )) > 0.0
    assert mi.search(BooleanQuery(should=[PhraseQuery(("quick", "fox"), slop=1)])) > 0.0


def test_multiterm_families():
    mi = _mi()
    q = lambda x: BooleanQuery(should=[x])
    assert mi.search(q(PrefixQuery("qui"))) > 0.0
    assert mi.search(q(PrefixQuery("zzz"))) == 0.0
    assert mi.search(q(WildcardQuery("f?x"))) > 0.0
    assert mi.search(q(FuzzyQuery("foxx", max_edits=1))) > 0.0
    assert mi.search(q(FuzzyQuery("foxxxx", max_edits=1))) == 0.0
    assert mi.search(q(TermRangeQuery("do", "dz", True, True))) > 0.0
    assert mi.search(q(TermInSetQuery(("wolf", "dog")))) > 0.0


def test_keyword_fields():
    mi = _mi(lang="en")
    assert mi.search(BooleanQuery(must=[TermQuery("lang:en"), TermQuery("fox")])) > 0.0
    assert mi.search(BooleanQuery(must=[TermQuery("lang:fr"), TermQuery("fox")])) == 0.0


@pytest.mark.usefixtures("ray_session")
def test_memoryindex_gate_parity():
    from lucene_ray.ops import bm25docs
    from tests.test_ops import assert_same

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    assert_same(
        bm25docs.memoryindex_engine(SF), con, bm25docs.memoryindex_engine_sql()
    )


@pytest.mark.usefixtures("ray_session")
def test_memoryindex_agrees_with_engine():
    """Per-doc MemoryIndex membership == engine doc sets for the shared
    boolean queries (the percolator consistency contract, per-query)."""
    import pyarrow.parquet as pq

    from lucene_ray.ops.bm25docs import _engine_index
    from lucene_ray.search.engine import IndexSearcher

    s = IndexSearcher(_engine_index(SF))
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    for q in ("merge AND window", "+batch -stream", '"sort merge"'):
        want = set(s.search(q, 1_000_000).docids.tolist())
        got = set()
        for did, text in zip(ids, texts):
            mi = MemoryIndex()
            mi.add_field("content", text)
            if mi.search(q) > 0.0:
                got.add(did)
        assert got == want, q
