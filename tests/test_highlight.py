"""Highlighting by re-analysis: offset recovery must tokenize EXACTLY like
the index kernel, and fragments must wrap every matched term."""

import pyarrow as pa
import pytest

from lucene_ray.analysis import CodeAnalyzer
from lucene_ray.search.highlight import highlight, token_spans

SAMPLES = [
    "def mergeSort(arr): return arr  # XMLHttpRequest SD500",
    "camelCase snake_case UPPERCASE lower 123abc456",
    "",
    "!!!@@@",
    "a" * 300 + " ok",  # over-long token dropped
]


@pytest.mark.parametrize("text", SAMPLES)
def test_token_spans_match_analyzer(text):
    an = CodeAnalyzer()
    want = an.tokenize_text(text)
    spans = token_spans(text)
    assert [t for t, _, _ in spans] == want
    # offsets point at the right characters (lowercased slice == token)
    for t, s, e in spans:
        assert text[s:e].lower() == t


def test_highlight_wraps_terms():
    text = "the mergeSort function merges sorted runs by merge policy"
    frags = highlight(text, ["merge", "sort"], fragment_chars=200)
    assert len(frags) == 1
    f = frags[0]
    assert "<b>merge</b>" in f and "<b>Sort</b>" in f
    # non-matching words unmarked
    assert "<b>function</b>" not in f


def test_highlight_no_match():
    assert highlight("nothing to see here", ["absent"]) == []


def test_fragment_selection():
    text = ("padding words " * 30) + "needle here" + (" more padding" * 30) + " needle again"
    frags = highlight(text, ["needle"], fragment_chars=40, max_fragments=2)
    assert len(frags) == 2
    assert all("<b>needle</b>" in f for f in frags)


def test_hit_near_fragment_boundary_still_highlighted():
    # hits at 0 and ~120 with 100-char windows: the second hit's centred
    # window overlaps fragment 1 but a shifted disjoint window exists
    text = "needle " + "x" * 110 + " needle tail"
    frags = highlight(text, ["needle"], fragment_chars=100, max_fragments=3)
    marked = "".join(frags)
    assert marked.count("<b>needle</b>") == 2
