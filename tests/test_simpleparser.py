"""SimpleQueryParser (queryparser/simple/SimpleQueryParser.java): structure
tests mirroring TestSimpleQueryParser's cases, plus SQL parity of the gate."""

import duckdb
import pytest

from lucene_ray.analysis import CodeAnalyzer
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    NestedBooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_ray.search.simpleparser import (
    ALL_OPERATORS,
    MUST,
    PHRASE_OPERATOR,
    PREFIX_OPERATOR,
    SimpleQueryParser,
    WHITESPACE_OPERATOR,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def p():
    return SimpleQueryParser(CodeAnalyzer())


def test_single_term(p):
    assert p.parse("foobar") == BooleanQuery(should=[TermQuery("foobar")])


def test_default_or(p):
    q = p.parse("a b")
    assert q.should == [TermQuery("a"), TermQuery("b")] and not q.must


def test_default_operator_and():
    p = SimpleQueryParser(CodeAnalyzer(), default_operator=MUST)
    q = p.parse("a b")
    assert q.must == [TermQuery("a"), TermQuery("b")] and not q.should


def test_explicit_and_or(p):
    q = p.parse("a+b")
    assert q.must == [TermQuery("a"), TermQuery("b")]
    q = p.parse("a|b")
    assert q.should == [TermQuery("a"), TermQuery("b")]


def test_operator_change_regroups_left(p):
    # a+b|c == ((a AND b) OR c): operator change wraps the current tree
    q = p.parse("a+b|c")
    assert len(q.should) == 2
    inner, c = q.should
    assert isinstance(inner, NestedBooleanQuery)
    assert inner.must == (TermQuery("a"), TermQuery("b"))
    assert c == TermQuery("c")


def test_negation_wrapper(p):
    q = p.parse("-a")
    (w,) = q.should
    assert isinstance(w, NestedBooleanQuery)
    assert w.must_not == (TermQuery("a"),)
    assert w.should == (MatchAllDocsQuery(),)
    # double negation cancels
    assert p.parse("--a") == BooleanQuery(should=[TermQuery("a")])


def test_phrase_and_slop(p):
    (ph,) = p.parse('"sort merge"').should
    assert ph == PhraseQuery(("sort", "merge"), slop=0)
    (ph,) = p.parse('"sort merge"~3').should
    assert ph.slop == 3
    # empty/unparsable slop handled like the reference: ~ at end -> slop 0
    (ph,) = p.parse('"sort merge"~').should
    assert ph == PhraseQuery(("sort", "merge"), slop=0)


def test_prefix_and_fuzzy(p):
    assert p.parse("mer*").should == [PrefixQuery("mer")]
    assert p.parse("foo~1").should == [FuzzyQuery("foo", max_edits=1)]
    # ~ with no digits = automatic fuzziness 2; >2 clamps to 2
    assert p.parse("foo~").should == [FuzzyQuery("foo", max_edits=2)]
    assert p.parse("foo~7").should == [FuzzyQuery("foo", max_edits=2)]
    # ~0 degrades to a plain term
    assert p.parse("foo~0").should == [TermQuery("foo")]


def test_precedence_groups(p):
    q = p.parse("(a|b)+c")
    assert len(q.must) == 2
    grp, c = q.must
    assert isinstance(grp, NestedBooleanQuery)
    assert grp.should == (TermQuery("a"), TermQuery("b"))
    assert c == TermQuery("c")


def test_never_throws_recovery(p):
    # unmatched quote degrades to terms; unmatched paren is extraneous;
    # trailing operators are ignored — none of these raise
    assert p.parse('"a b').should == [TermQuery("a"), TermQuery("b")]
    assert p.parse("(a b").should == [TermQuery("a"), TermQuery("b")]
    assert p.parse("a+").should == [TermQuery("a")]
    assert p.parse(")a(").should == [TermQuery("a")]
    assert p.parse("") == BooleanQuery()
    assert p.parse("   ") == BooleanQuery()


def test_match_all_star(p):
    assert p.parse(" * ") == BooleanQuery(should=[MatchAllDocsQuery()])


def test_escape_operator(p):
    # escaped '*' is literal -> analyzed away with the punctuation
    (t,) = p.parse(r"a\*b").should
    # CodeAnalyzer splits on '*' -> multi-token group
    assert isinstance(t, (NestedBooleanQuery, TermQuery))


def test_flags_disable_features():
    p = SimpleQueryParser(
        CodeAnalyzer(), flags=WHITESPACE_OPERATOR | PHRASE_OPERATOR
    )
    # '+' is plain text now (analyzer strips it -> two tokens, default OR)
    q = p.parse("a+b c")
    assert all(not isinstance(x, PrefixQuery) for x in q.should)
    p2 = SimpleQueryParser(CodeAnalyzer(), flags=WHITESPACE_OPERATOR)
    # without PREFIX_OPERATOR, 'mer*' analyzes as the bare term
    assert PrefixQuery("mer") not in p2.parse("mer*").should


@pytest.mark.usefixtures("ray_session")
def test_simpleparser_gate_parity():
    from lucene_ray.ops import bm25docs
    from tests.test_ops import assert_same

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    assert_same(
        bm25docs.simpleparser_engine(SF), con, bm25docs.simpleparser_engine_sql()
    )


# ---------------------------------------------------------------------------
# Surround query language (queryparser/surround/parser/QueryParser.jj)
# ---------------------------------------------------------------------------

from lucene_ray.search.query import (  # noqa: E402
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_ray.search.surround import (  # noqa: E402
    SurroundParseError,
    SurroundQueryParser,
)


@pytest.fixture(scope="module")
def sp():
    return SurroundQueryParser(CodeAnalyzer())


def test_surround_infix_w(sp):
    (q,) = sp.parse("a 3w b").should
    assert q == SpanNearQuery(
        (SpanTermQuery("a"), SpanTermQuery("b")), slop=2, ordered=True
    )
    # default distance 1 -> slop 0
    (q,) = sp.parse("a w b").should
    assert q.slop == 0 and q.ordered


def test_surround_prefix_n(sp):
    (q,) = sp.parse("5N(a, b, c)").should
    assert q.slop == 4 and not q.ordered and len(q.terms) == 3


def test_surround_or_inside_distance(sp):
    (q,) = sp.parse("or(a, b) w c").should
    assert isinstance(q.terms[0], SpanOrQuery)


def test_surround_boolean_levels(sp):
    bq = sp.parse("a and b not c")
    # NOT binds tighter than AND: a AND (b NOT c)
    assert len(bq.must) == 2
    inner = bq.must[1]
    assert inner.must == (TermQuery("b"),)
    assert inner.must_not == (TermQuery("c"),)
    bq2 = sp.parse("AND(a, OR(b, c))")
    assert len(bq2.must) == 2


def test_surround_errors(sp):
    with pytest.raises(SurroundParseError):
        sp.parse("a w (b and c)")  # AND inside a distance operator
    with pytest.raises(SurroundParseError):
        sp.parse("NOT(a, b)")  # NOT has no prefix form
    with pytest.raises(SurroundParseError):
        sp.parse("(a")  # unbalanced


@pytest.mark.usefixtures("ray_session")
def test_surround_gate_parity():
    from lucene_ray.ops import bm25docs
    from tests.test_ops import assert_same

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    assert_same(
        bm25docs.surround_engine(SF), con, bm25docs.surround_engine_sql()
    )
