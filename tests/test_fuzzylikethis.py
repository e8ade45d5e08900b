"""FuzzyLikeThisQuery (search/fuzzylikethis.py —
sandbox/queries/FuzzyLikeThisQuery.java): variant enumeration, boost and
idf math, per-term and global caps, queue tie-breaks, zero-df fallback,
rewrite shape, engine round trip."""

import math

import numpy as np
import pytest

from lucene_ray.search.fuzzylikethis import FuzzyLikeThisQuery


class _FakeReader:
    """Vocabulary + stats stub standing in for IndexReader."""

    def __init__(self, dfs: dict, doc_count: int):
        self._dfs = dfs
        self.doc_count = doc_count

    def vocabulary(self):
        return np.array(sorted(self._dfs), dtype=object)

    def global_term_stats(self, terms):
        return {t: (self._dfs.get(t, 0), self._dfs.get(t, 0)) for t in terms}


def _idf(df, n):
    return np.float32(math.log((n + 1) / (df + 1)) + 1.0)


def test_variant_scoring_and_order():
    rd = _FakeReader({"merge": 100, "marge": 3, "merges": 7, "xyzzy": 50}, 200)
    q = FuzzyLikeThisQuery(10)
    q.add_terms("merge", "content", 1.0, 0)
    sel = q.selected_terms(rd)
    # variants within ed 1: merge (1.0), marge (1-1/5=0.8), merges (1-1/6)
    terms = [v for _s, v, _ in sel]
    assert set(terms) == {"merge", "marge", "merges"}
    idf = float(_idf(100, 200))  # ALL variants share the source idf
    # boost = 1 - ed/min(|variant|, |source|): marge AND merges both get
    # 1 - 1/5 (min is the 5-char source) -> equal scores, term-asc tie
    b = float(np.float32(np.float32(0.8) * np.float32(0.8)))
    want = [("merge", 1.0 * idf), ("marge", b * idf), ("merges", b * idf)]
    got = [(v, s) for _src, v, s in sel]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (gv, gs), (wv, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-6)


def test_zero_df_source_uses_integer_mean_variant_df():
    rd = _FakeReader({"query": 11, "quirk": 4}, 100)
    q = FuzzyLikeThisQuery(10)
    q.add_terms("quer", "content", 2.0, 2)  # prefix 'qu', suffix ed<=2
    sel = q.selected_terms(rd)
    assert {v for _s, v, _ in sel} == {"query", "quirk"}
    avg_df = (11 + 4) // 2  # INTEGER mean (FuzzyLikeThisQuery.java:237)
    idf = float(_idf(avg_df, 100))
    by_term = {v: s for _s, v, s in sel}
    b_query = np.float32(1.0) - np.float32(1) / np.float32(4)
    assert by_term["query"] == pytest.approx(
        float(np.float32(b_query * b_query)) * idf, rel=1e-6
    )


def test_global_cap_and_tiebreak():
    # four exact-ish variants with identical scores -> term-asc cut
    rd = _FakeReader({"aa": 5, "ab": 5, "ac": 5, "ad": 5}, 50)
    q = FuzzyLikeThisQuery(2)
    q.add_terms("aa", "content", 1.0, 1)
    sel = q.selected_terms(rd)
    # all share prefix 'a', suffix ed<=1: every term; exact aa boost 1,
    # others boost 0.5 -> aa first; ties among 0.5 cut at 'ab'
    assert [v for _s, v, _ in sel] == ["aa", "ab"]


def test_prefix_clamped_to_term_length():
    rd = _FakeReader({"ab": 5, "abc": 5}, 50)
    q = FuzzyLikeThisQuery(10)
    q.add_terms("ab", "content", 1.0, 7)  # prefix longer than the term
    sel = q.selected_terms(rd)
    assert {v for _s, v, _ in sel} == {"ab", "abc"}


def test_validation():
    q = FuzzyLikeThisQuery(5)
    with pytest.raises(ValueError, match="minSimilarity"):
        q.add_terms("x", "content", 1.5, 0)
    with pytest.raises(ValueError, match="minSimilarity"):
        q.add_terms("x", "content", 3.0, 0)
    with pytest.raises(ValueError, match="content"):
        q.add_terms("x", "lang", 1.0, 0)


def test_rewrite_shape_and_engine_round_trip(ray_session):
    from lucene_ray.ops.bm25docs import _engine_index
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import (
        BooleanQuery,
        ConstantScoreQuery,
        NestedBooleanQuery,
    )
    from lucene_ray.search.reader import IndexReader

    ix = _engine_index("/root/testdata/sf0.001")
    rd = IndexReader(ix)
    q = FuzzyLikeThisQuery(20)
    q.add_terms("merge window", "content", 1.0, 0)
    bq = q.rewrite(rd)
    assert isinstance(bq, BooleanQuery) and bq.should
    for clause in bq.should:
        assert isinstance(clause, (ConstantScoreQuery, NestedBooleanQuery))
    s = IndexSearcher(ix)
    td = s.search(bq, 25)
    assert len(td.docids) > 0
    # every hit contains at least one selected variant
    sel = {v for _s, v, _ in q.selected_terms(rd)}
    assert sel  # non-empty selection drove the query


def test_global_term_stats_duplicate_safe(ray_session):
    """The reader stats API sums duplicates once (the FuzzyLikeThis df bug
    this round: variants + [term] can repeat the source term)."""
    from lucene_ray.ops.bm25docs import _engine_index
    from lucene_ray.search.reader import IndexReader

    rd = IndexReader(_engine_index("/root/testdata/sf0.001"))
    one = rd.global_term_stats(["merge"])["merge"]
    two = rd.global_term_stats(["merge", "merge"])["merge"]
    assert one == two
