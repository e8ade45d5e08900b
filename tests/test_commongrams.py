"""CommonGramsFilter / CommonGramsQueryFilter (analysis/analyzer.py) —
pinned by the reference's TestCommonGramsFilter vectors
(analysis/common/src/test/.../commongrams/TestCommonGramsFilter.java;
'the'/'of'/'s' in those vectors are members of the snowball common set
used here)."""

import pyarrow as pa
import pytest

from lucene_ray.analysis import get_analyzer


@pytest.fixture(scope="module")
def cg():
    return get_analyzer("commongrams")


@pytest.fixture(scope="module")
def cgq():
    return get_analyzer("commongrams_query")


def test_index_stream_terms_and_positions(cg):
    r, t, p = cg.tokenize_flat(
        pa.array(["the fox", "fox of the", "quick brown fox"])
    )
    def row(i):
        sel = r == i
        return list(zip(t.take(pa.array(sel.nonzero()[0])).to_pylist(),
                        p[sel].tolist()))

    # TestCommonGramsFilter: "the fox" -> the, the_fox(posInc 0), fox
    assert row(0) == [("the", 0), ("the_fox", 0), ("fox", 1)]
    # "fox of the" -> fox, fox_of, of, of_the, the (incs 1,0,1,0,1)
    assert row(1) == [
        ("fox", 0), ("fox_of", 0), ("of", 1), ("of_the", 1), ("the", 2)
    ]
    # no common words -> plain unigrams
    assert row(2) == [("quick", 0), ("brown", 1), ("fox", 2)]


def test_query_stream(cgq):
    # testCommonGramsQueryFilter vectors, verbatim
    cases = {
        "the fox": ["the_fox"],
        "fox of": ["fox_of"],
        "of the": ["of_the"],
        "the": ["the"],
        "foo": ["foo"],
        "quick brown fox": ["quick", "brown", "fox"],
        "the quick brown": ["the_quick", "quick", "brown"],
        "the fox of": ["the_fox", "fox_of"],
        "of the fox": ["of_the", "the_fox"],
        "of the of": ["of_the", "the_of"],
        "fox of the": ["fox_of", "of_the"],
    }
    for s, want in cases.items():
        assert cgq.tokenize_text(s) == want, s


def test_gram_phrase_aligns_with_index_positions(cg, cgq):
    """A phrase of query grams matches the index-side posInc-0 gram
    positions: grams of adjacent pairs sit at consecutive positions."""
    r, t, p = cg.tokenize_flat(pa.array(["fox of the lazy dog"]))
    terms = t.to_pylist()
    pos = {term: pp for term, pp in zip(terms, p.tolist())}
    q = cgq.tokenize_text("fox of the")
    assert q == ["fox_of", "of_the"]
    assert pos["of_the"] == pos["fox_of"] + 1


def test_overlaps_counted_for_norms(cg):
    # grams are posInc-0 overlaps: doc_len (positions) excludes them
    r, t, p = cg.tokenize_flat(pa.array(["the fox of the dog"]))
    n_unigrams = 5
    assert p.max() + 1 == n_unigrams
    assert len(t) > n_unigrams  # grams present on top
