"""Flexible parser front-ends (search/flexparser.py) — grammar semantics,
the standard-vs-precedence nesting split, the config surface, and the new
fn: interval combinators' per-doc algebra.

Reference contracts:
  queryparser/flexible/standard/parser/StandardSyntaxParser.jj:228-230
  standard/processors/BooleanQuery2ModifierNodeProcessor.java (flatten)
  precedence/processors/BooleanModifiersQueryNodeProcessor.java (nest)
  queries/intervals/Intervals.java:321-501 (extend/overlapping/before/
  after/within/notWithin/atLeast/unorderedNoOverlaps)
"""

import numpy as np
import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.search import intervals as iv
from lucene_ray.search.flexparser import (
    PrecedenceQueryParser,
    StandardQueryParser,
)
from lucene_ray.search.query import (
    BooleanQuery,
    DisjunctionSumQuery,
    IntervalQuery,
    NestedBooleanQuery,
    PhraseQuery,
    PointRangeQuery,
    TermQuery,
    parse_query,
)


@pytest.fixture(scope="module")
def an():
    return get_analyzer("standard")


@pytest.fixture(scope="module")
def std(an):
    return StandardQueryParser(an)


@pytest.fixture(scope="module")
def prec(an):
    return PrecedenceQueryParser(an)


# ---------------------------------------------------------------- booleans


def test_standard_flattens_like_classic(std, an):
    """BooleanQuery2ModifierNodeProcessor TAG_REMOVE: `a AND b OR c` is
    flat `+a +b c` — identical clause sets to the classic parser."""
    for q in [
        "merge AND sort OR batch",
        "merge sort",
        "merge OR sort AND batch",
        "NOT merge AND sort",
        "+merge -sort batch",
    ]:
        got = std.parse(q)
        classic = parse_query(q, an)
        assert got == classic, q


def test_precedence_keeps_nesting(prec):
    bq = prec.parse("merge AND sort OR batch")
    assert not bq.must and not bq.must_not
    (clause,) = bq.should
    assert isinstance(clause, DisjunctionSumQuery)
    nested, batch = clause.disjuncts
    assert isinstance(nested, NestedBooleanQuery)
    assert set(t.term for t in nested.must) == {"merge", "sort"}
    assert batch == TermQuery("batch")


def test_precedence_explicit_modifier_wins(prec):
    bq = prec.parse("-merge AND sort")
    (clause,) = bq.should
    assert isinstance(clause, NestedBooleanQuery)
    assert clause.must == (TermQuery("sort"),)
    assert clause.must_not == (TermQuery("merge"),)


def test_default_operator_and(an):
    p = StandardQueryParser(an, default_operator="and")
    bq = p.parse("merge batch")
    assert set(t.term for t in bq.must) == {"merge", "batch"}
    # explicit OR keeps its children optional even under default AND
    bq = p.parse("merge OR batch")
    assert not bq.must
    assert set(t.term for t in bq.should) == {"merge", "batch"}


def test_group_boost_and_field_scope(std):
    bq = std.parse("lang:(en OR es)^2")
    (clause,) = bq.should
    assert isinstance(clause, DisjunctionSumQuery)
    assert {q.term for q in clause.disjuncts} == {"lang:en", "lang:es"}
    assert {q.boost for q in clause.disjuncts} == {2.0}


# ------------------------------------------------------------------ config


def test_multi_field_expansion(an):
    p = StandardQueryParser(an, fields=("content", "repo"))
    bq = p.parse("src7")
    (clause,) = bq.should
    assert isinstance(clause, DisjunctionSumQuery)
    assert {getattr(q, "term", None) for q in clause.disjuncts} == {
        "src7",
        "repo:src7",
    }
    # an explicit field prefix suppresses the expansion
    bq = p.parse("lang:en")
    assert bq.should == [TermQuery("lang:en")]


def test_points_config(an):
    p = StandardQueryParser(an, points_config={"n_chars": int})
    assert p.parse("n_chars:42").should == [
        PointRangeQuery("n_chars", 42, 42)
    ]
    assert p.parse("n_chars:{10 TO 20]").should == [
        PointRangeQuery("n_chars", 11, 20)
    ]
    assert p.parse("n_chars:[* TO 9]").should == [
        PointRangeQuery("n_chars", None, 9)
    ]


def test_leading_wildcard_rejected_by_default(std, an):
    with pytest.raises(ValueError):
        std.parse("*lead")
    with pytest.raises(ValueError):
        std.parse("?x")
    ok = StandardQueryParser(an, allow_leading_wildcard=True)
    assert ok.parse("*lead").should  # parses fine when enabled
    # a mid-pattern wildcard is always fine
    assert std.parse("me*ge").should


def test_default_phrase_slop(an):
    p = StandardQueryParser(an, phrase_slop=2)
    (q,) = p.parse('"merge sort"').should
    assert isinstance(q, PhraseQuery) and q.slop == 2
    # explicit slop wins over the default
    (q,) = p.parse('"merge sort"~1').should
    assert q.slop == 1


def test_parse_errors(std):
    for bad in ["(merge", "merge)", "fn:nosuch(a b)", "fn:maxgaps(merge 2)",
                "fn:ordered(merge", "merge\\"]:
        with pytest.raises(ValueError):
            std.parse(bad)


# ----------------------------------------------------------- fn: intervals


def test_fn_parse_shapes(std):
    (q,) = std.parse("fn:ordered(merge sort)").should
    assert isinstance(q, IntervalQuery)
    assert q.source == iv.ordered("merge", "sort")
    (q,) = std.parse('fn:phrase("external sorting" merge)').should
    assert q.source == iv.phrase(iv.phrase("external", "sorting"), "merge")
    (q,) = std.parse("fn:within(merge 3 fn:or(sort batch))^2").should
    assert q.boost == 2.0
    assert q.source == iv.within("merge", 3, iv.or_("sort", "batch"))
    (q,) = std.parse("fn:atLeast(2 merge sort batch)").should
    assert q.source == iv.at_least(2, "merge", "sort", "batch")
    (q,) = std.parse("content:fn:extend(merge 1 2)").should
    assert q.source == iv.extend("merge", 1, 2)
    with pytest.raises(ValueError):
        std.parse("lang:fn:ordered(a b)")  # non-default field


def _pos_of(table):
    def pos_of(t):
        return np.asarray(table.get(t, []), dtype=np.int64)

    return pos_of


def test_eval_extend_and_overlap():
    pos = _pos_of({"a": [5], "b": [7, 20]})
    assert iv.eval_source(iv.extend("a", 2, 3), pos) == [(3, 8, 0)]
    # extend clamps start at 0
    assert iv.eval_source(iv.extend("a", 9, 0), pos) == [(0, 5, 0)]
    # a's [5,5] does not overlap b's points; extended to [3,8] it overlaps 7
    assert iv.eval_source(iv.overlapping("a", "b"), pos) == []
    assert iv.eval_source(
        iv.overlapping(iv.extend("a", 2, 3), "b"), pos
    ) == [(3, 8, 0)]
    assert iv.eval_source(iv.non_overlapping("b", "a"), pos) == [
        (7, 7, 0),
        (20, 20, 0),
    ]
    assert iv.eval_source(iv.non_overlapping("a", "b"), pos) == [(5, 5, 0)]


def test_eval_before_after():
    pos = _pos_of({"a": [1, 10, 30], "b": [12, 15]})
    # before: a intervals ending before the LATEST b start (15)
    assert iv.eval_source(iv.before("a", "b"), pos) == [(1, 1, 0), (10, 10, 0)]
    # after: a intervals starting after the EARLIEST b end (12)
    assert iv.eval_source(iv.after("a", "b"), pos) == [(30, 30, 0)]
    assert iv.eval_source(iv.before("a", "missing"), pos) == []


def test_eval_within_not_within():
    pos = _pos_of({"k": [3, 9, 40], "m": [6]})
    assert iv.eval_source(iv.within("k", 3, "m"), pos) == [(3, 3, 0), (9, 9, 0)]
    assert iv.eval_source(iv.not_within("k", 3, "m"), pos) == [(40, 40, 0)]


def test_eval_at_least():
    pos = _pos_of({"a": [1], "b": [3], "c": [100]})
    # minimal windows covering >= 2 of {a,b,c}: [1,3] (a,b) and [3,100]
    # (b,c) — neither contains the other; the (a,c) cover [1,100] contains
    # [1,3] and is pruned by minimality
    assert iv.eval_source(iv.at_least(2, "a", "b", "c"), pos) == [
        (1, 3, 1),
        (3, 100, 96),
    ]
    # n == len degrades to unordered, n > len matches nothing
    assert iv.eval_source(iv.at_least(3, "a", "b", "c"), pos) == [(1, 100, 97)]
    assert iv.eval_source(iv.at_least(4, "a", "b", "c"), pos) == []
    # a missing source still lets the others satisfy the minimum
    pos2 = _pos_of({"a": [1], "b": [3]})
    assert iv.eval_source(iv.at_least(2, "a", "b", "zz"), pos2) == [(1, 3, 1)]


def test_eval_unordered_no_overlaps():
    pos = _pos_of({"a": [5], "b": [5]})
    # same position: ordered(a,b) and ordered(b,a) both fail
    assert iv.eval_source(iv.unordered_no_overlaps("a", "b"), pos) == []
    pos = _pos_of({"a": [5], "b": [8]})
    assert iv.eval_source(iv.unordered_no_overlaps("a", "b"), pos) == [
        (5, 8, 2)
    ]


def test_source_terms_covers_new_nodes():
    src = iv.at_least(
        2,
        iv.before("a", "b"),
        iv.non_overlapping(iv.extend("c", 1, 1), "d"),
        iv.overlapping("e", iv.after("f", "g")),
    )
    assert iv.source_terms(src) == ("a", "b", "c", "d", "e", "f", "g")
