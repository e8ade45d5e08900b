"""Lucene RegExp grammar (search/regexp.py — util/automaton/RegExp.java
compiled to the CharDFA): operator semantics, precedence, predefined
classes, intervals, intersection, error paths, vocab intersect, and the
engine round trip."""

import random
import string

import numpy as np
import pytest

from lucene_ray.search.regexp import regexp_dfa


CASES = [
    # (pattern, accepted, rejected)
    ("abc", ["abc"], ["ab", "abcd", ""]),
    ("s[ct]a[nr].*", ["scan", "start", "stanx"], ["sxan", "sca"]),
    ("(merge|window)s?", ["merge", "merges", "windows"], ["merg", "windowss"]),
    ("mer[a-z]*[0-9]*", ["mer", "merge", "merge12"], ["mer!", "12mer"]),
    ("a{2,3}", ["aa", "aaa"], ["a", "aaaa"]),
    ("a{2,}", ["aa", "aaaaa"], ["a"]),
    ("a{0,1}b", ["b", "ab"], ["aab"]),
    (".", ["x", "日"], ["", "xy"]),
    ("@", ["", "anything at all"], []),
    ("#", [], ["", "a"]),
    ('"a|b"', ["a|b"], ["a", "b"]),
    ("()", [""], ["a"]),
    ("[^a-c]x", ["dx", "zx"], ["ax", "bx"]),
    ("\\d+", ["123", "0"], ["a1", ""]),
    ("\\w+", ["ab_1"], ["a b"]),
    ("\\W", [" ", "!"], ["a", "0"]),
    ("\\s", [" ", "\t"], ["a"]),
    ("[\\d]+x", ["12x"], ["x"]),
    # union binds loosest: (a&a)|b accepts b (RegExp.parseUnionExp)
    ("a&a|b", ["a", "b"], ["ab"]),
    ("(a|ab)&(ab|b)", ["ab"], ["a", "b"]),
    ("<1-10>", ["1", "5", "10", "05", "0010"], ["0", "11", ""]),
    ("<05-10>", ["05", "07", "10"], ["5", "010", "4"]),
    # equal-length bounds fix the digit count (RegExp.java:1252): no
    # leading-zero widening, unlike <1-10>
    ("<100-250>", ["100", "199", "250"], ["99", "251", "0123", "02510"]),
    ("\\.", ["."], ["a"]),
    ("a\\|b", ["a|b"], ["ab"]),
    ("foo\\*bar", ["foo*bar"], ["foobar"]),
    ("a/b", ["a/b"], ["ab"]),
    # makeCharRange(from > to) matches nothing; negated it matches any char
    ("[b-a]x", [], ["ax", "bx", "x"]),
    ("[^b-a]x", ["ax", "zx"], ["x", "aax"]),
]


@pytest.mark.parametrize("pat,acc,rej", CASES, ids=[c[0] for c in CASES])
def test_grammar_vectors(pat, acc, rej):
    d = regexp_dfa(pat)
    for t in acc:
        assert d.accepts(t), (pat, t)
    for t in rej:
        assert not d.accepts(t), (pat, t)


def test_interval_exhaustive():
    """<n-m> against integer parsing over all strings up to 4 digits."""
    d = regexp_dfa("<7-123>")
    for v in range(0, 1500):
        for pad in (0, 1, 2):
            s = str(v).zfill(len(str(v)) + pad)
            want = 7 <= v <= 123
            assert d.accepts(s) == want, s
    dd = regexp_dfa("<007-123>")  # equal-length bounds: exactly 3 digits
    assert dd.accepts("007") and dd.accepts("099") and dd.accepts("123")
    assert not dd.accepts("7") and not dd.accepts("0070")


def test_error_paths():
    for bad in ["a{2", "[a", "(a", '"x', "<foo>", "<1-2", "a{3,1}", "<1->"]:
        with pytest.raises(ValueError):
            regexp_dfa(bad)


def test_vocab_intersect_matches_accepts():
    rng = random.Random(19)
    vocab = np.array(sorted({
        "".join(rng.choice(string.ascii_lowercase[:6]) for _ in range(rng.randint(1, 6)))
        for _ in range(4000)
    }))
    for pat in ["ab.*", "(ab|ba)c*", "[a-c]{2,3}", ".*f", "a&a", "\\w{4}"]:
        d = regexp_dfa(pat)
        got = d.intersect(vocab)
        want = [t for t in vocab.tolist() if d.accepts(t)]
        assert got == want, pat


def test_engine_round_trip(ray_session):
    """RegexpQuery through the real searcher equals the DuckDB-style
    brute force over the tokenized corpus."""
    from lucene_ray.ops.bm25docs import _engine_index
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery, RegexpQuery
    from lucene_ray.search.reader import IndexReader

    ix = _engine_index("/root/testdata/sf0.001")
    s = IndexSearcher(ix)
    rd = IndexReader(ix)
    vocab = rd.vocabulary()
    for pat in ["s[ct]a[nr].*", "(merge|window)s?", "[a-z]{3}", "merge&.*ge"]:
        d = regexp_dfa(pat)
        terms = [t for t in vocab.tolist() if d.accepts(t)]
        td = s.search(BooleanQuery(should=[RegexpQuery(pat)]), 1 << 20)
        if not terms:
            assert len(td.docids) == 0
            continue
        # docs matching any accepted term
        from lucene_ray.search.query import TermQuery

        want = s.search(
            BooleanQuery(should=[TermQuery(t) for t in terms]), 1 << 20
        )
        assert sorted(td.docids.tolist()) == sorted(want.docids.tolist()), pat


def test_memoryindex_uses_lucene_grammar(ray_session):
    from lucene_ray.search.memoryindex import MemoryIndex
    from lucene_ray.search.query import RegexpQuery

    mi = MemoryIndex()
    mi.add_field("content", "the quick brown fox")
    assert mi.search(RegexpQuery("qu.ck")) > 0
    assert mi.search(RegexpQuery("q[a-z]+k&.*ck")) > 0
    assert mi.search(RegexpQuery("qu?k")) == 0.0
