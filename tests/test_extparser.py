"""ExtendableQueryParser (search/extparser.py) — splitting scheme, leaf
dispatch, classic fallback (queryparser/ext/ contract)."""

import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.search.extparser import (
    ExtendableQueryParser,
    ExtensionQuery,
    Extensions,
    _split_first_unescaped_colon,
)
from lucene_ray.search.query import TermQuery, WildcardQuery, parse_query


@pytest.fixture(scope="module")
def an():
    return get_analyzer("standard")


def test_split_extension_field():
    ex = Extensions()  # ':' delimiter
    assert ex.split_extension_field("dflt", "title") == ("title", None)
    assert ex.split_extension_field("dflt", "title:key") == ("title", "key")
    assert ex.split_extension_field("dflt", ":key") == ("dflt", "key")
    under = Extensions("_")
    assert under.split_extension_field(None, "repo_kw") == ("repo", "kw")
    assert under.split_extension_field("d", "_kw") == ("d", "kw")
    # build/split round-trip (Extensions.java:148-150 contract)
    built = under.build_extension_field("kw", "repo")
    assert under.split_extension_field(None, built) == ("repo", "kw")


def test_split_first_unescaped_colon():
    assert _split_first_unescaped_colon("title:term") == ("title", "term")
    assert _split_first_unescaped_colon(r"title\:key:term") == (
        r"title\:key",
        "term",
    )
    assert _split_first_unescaped_colon("noColonHere") == (None, "noColonHere")
    assert _split_first_unescaped_colon(r"all\:escaped") == (
        None,
        r"all\:escaped",
    )
    # leading/trailing colon: not a field token
    assert _split_first_unescaped_colon(":x") == (None, ":x")
    assert _split_first_unescaped_colon("x:") == (None, "x:")


def test_dispatch_and_fallback(an):
    calls = []

    def ext(q: ExtensionQuery):
        calls.append((q.field, q.raw_query_text))
        return TermQuery(f"EXT:{q.field}:{q.raw_query_text}")

    exts = Extensions("_")
    exts.add("kw", ext)
    p = ExtendableQueryParser(an, extensions=exts, default_field="content")
    bq = p.parse("repo_kw:src3")
    assert bq.should == [TermQuery("EXT:repo:src3")]
    assert calls == [("repo", "src3")]

    # default-field form: leading delimiter
    bq = p.parse("_kw:hello")
    assert bq.should == [TermQuery("EXT:content:hello")]

    # unregistered key -> classic behavior, byte-identical to parse_query
    for q in ["lang:en", "merge sort", "n_chars:[100 TO 200]", "repo_xx:v"]:
        assert p.parse(q) == parse_query(q, an), q


def test_colon_delimiter_escaped_form(an):
    exts = Extensions()
    exts.add("len", lambda q: TermQuery(f"LEN:{q.raw_query_text}"))
    p = ExtendableQueryParser(an, extensions=exts)
    assert p.parse(r"\:len:42").should == [TermQuery("LEN:42")]
    assert p.parse(r"content\:len:42").should == [TermQuery("LEN:42")]


def test_wildcard_fuzzy_not_dispatched(an):
    exts = Extensions("_")
    exts.add("kw", lambda q: TermQuery("NEVER"))
    p = ExtendableQueryParser(an, extensions=exts)
    # getFieldQuery only fires for plain term/phrase leaves — wildcard and
    # fuzzy syntax routes to the multi-term handlers instead
    (q,) = p.parse("repo_kw:src*").should
    assert isinstance(q, WildcardQuery)
    assert "NEVER" not in repr(p.parse("repo_kw:src3~1"))


def test_phrase_dispatch_and_none_result(an):
    exts = Extensions("_")
    exts.add("up", lambda q: TermQuery(f"P:{q.raw_query_text}"))
    exts.add("nil", lambda q: None)
    p = ExtendableQueryParser(an, extensions=exts)
    assert p.parse('content_up:"merge sort"').should == [TermQuery("P:merge sort")]
    assert p.parse('content_nil:"x" merge').should == [TermQuery("merge")]
