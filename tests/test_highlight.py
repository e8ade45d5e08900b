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


# ---------------------------------------------------------------------------
# Postings-offsets strategy (index_options="offsets"): byte-identity with the
# re-analysis path, merge survival, and PassageScorer weights.
# ---------------------------------------------------------------------------

import glob


@pytest.fixture(scope="module")
def offsets_index(tmp_path_factory, ray_session):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus

    cd = str(tmp_path_factory.mktemp("hl_corpus"))
    write_corpus(cd, n_docs=240, n_shards=2, seed=11, row_group_size=40)
    ix = str(tmp_path_factory.mktemp("hl_index"))
    build_index(
        sorted(glob.glob(cd + "/*.parquet")), ix, target_docs=80,
        index_options="offsets",
    )
    import pyarrow.parquet as pq

    content = pa.concat_tables(
        [pq.read_table(p, columns=["content"]) for p in sorted(glob.glob(cd + "/*.parquet"))]
    ).column("content").to_pylist()
    return ix, content


def _identity_sweep(reader, content, terms):
    from lucene_ray.search.highlight import highlight, highlight_by_offsets

    for doc, text in enumerate(content):
        a = highlight(text, terms, fragment_chars=80)
        b = highlight_by_offsets(reader, doc, text, terms, fragment_chars=80)
        assert a == b, f"doc {doc}: offsets path diverged from re-analysis"


def test_offsets_path_matches_reanalysis(offsets_index):
    """UnifiedHighlighter parity bar (VERDICT r2 #7): the offsets path must
    be byte-identical to re-analysis on every corpus doc."""
    from lucene_ray.search.reader import IndexReader

    ix, content = offsets_index
    r = IndexReader(ix)
    assert r.has_offsets
    _identity_sweep(r, content, ["batch", "block", "buffer", "yield", "index"])
    _identity_sweep(r, content, ["the", "return"])


def test_offsets_spans_slice_exact_tokens(offsets_index):
    from lucene_ray.search.highlight import index_token_spans
    from lucene_ray.search.reader import IndexReader

    ix, content = offsets_index
    r = IndexReader(ix)
    checked = 0
    for doc in range(0, len(content), 7):
        for t, s, e in index_token_spans(r, doc, ["merge", "batch", "value"]):
            assert content[doc][s:e].lower() == t
            checked += 1
    assert checked > 10


def test_offsets_survive_merge(offsets_index):
    from lucene_ray.index.merge import force_merge
    from lucene_ray.search.reader import IndexReader

    ix, content = offsets_index
    m = force_merge(ix)
    assert len(m.live_segments) == 1
    r = IndexReader(ix)
    assert r.has_offsets
    _identity_sweep(r, content, ["batch", "block", "buffer", "yield", "index"])


def test_byte_to_char_spans_non_ascii():
    from lucene_ray.search.highlight import _byte_spans_to_char

    text = "héllo wörld — naïve café abc123"
    b = text.encode("utf-8")
    spans = []
    for tok in (b"abc", b"123", b"na\xc3\xafve", b"caf\xc3\xa9"):
        s = b.find(tok)
        spans.append((tok.decode(), s, s + len(tok)))
    for t, cs, ce in _byte_spans_to_char(text, spans):
        assert text[cs:ce] == t


def test_english_offsets_point_at_original_token():
    """Stemmed terms keep the ORIGINAL token's span (stemmers never touch
    OffsetAttribute)."""
    from lucene_ray.analysis import get_analyzer

    an = get_analyzer("english")
    texts = ["the running dogs jumped quickly", "merges merging merged"]
    arr = pa.array(texts, type=pa.string())
    row_idx, terms, _pos, starts, lens = an.tokenize_flat(arr, with_offsets=True)
    assert len(terms) > 0
    for r, t, s, L in zip(row_idx, terms.to_pylist(), starts, lens):
        orig = texts[int(r)][int(s) : int(s + L)]
        # the stem is a prefix-ish reduction of the original token
        assert orig.lower().startswith(t[:3])


def test_passage_weights_idf_ordering(offsets_index):
    from lucene_ray.search.highlight import passage_weights
    from lucene_ray.search.reader import IndexReader

    ix, _content = offsets_index
    r = IndexReader(ix)
    vocab = r.vocabulary()
    stats = r.global_term_stats(list(vocab[:200]))
    present = sorted(
        (t for t in stats if stats[t][0] > 0), key=lambda t: stats[t][0]
    )
    rare, common = present[0], present[-1]
    w = passage_weights(r, [rare, common])
    assert w[rare] > w[common] > 0


def test_highlight_hits_offsets_integration(offsets_index):
    from lucene_ray.search.engine import IndexSearcher

    ix, content = offsets_index

    def lookup(docids):
        return [content[d] for d in docids]

    s = IndexSearcher(ix)
    hits = s.search("merge", 5)
    from lucene_ray.search.highlight import highlight_hits

    rows = highlight_hits(s, "merge", k=5, content_lookup=lookup)
    assert len(rows) == min(5, len(hits.docids))
    assert any("<b>" in f for row in rows for f in row.get("fragments", []))
    # weighted variant runs and returns the same docids
    rows_w = highlight_hits(s, "merge", k=5, content_lookup=lookup, use_weights=True)
    assert [r["docid"] for r in rows_w] == [r["docid"] for r in rows]


# ---------------------------------------------------------------------------
# FastVectorHighlighter strategy (term_vectors=True + offsets): byte-identity
# with BOTH other strategies on every corpus doc.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tv_offsets_index(tmp_path_factory, ray_session):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus

    cd = str(tmp_path_factory.mktemp("fvh_corpus"))
    write_corpus(cd, n_docs=160, n_shards=2, seed=23, row_group_size=40)
    ix = str(tmp_path_factory.mktemp("fvh_index"))
    build_index(
        sorted(glob.glob(cd + "/*.parquet")), ix, target_docs=80,
        index_options="offsets", term_vectors=True,
    )
    import pyarrow.parquet as pq

    content = pa.concat_tables(
        [pq.read_table(p, columns=["content"]) for p in sorted(glob.glob(cd + "/*.parquet"))]
    ).column("content").to_pylist()
    return ix, content


def test_fvh_matches_both_strategies(tv_offsets_index):
    from lucene_ray.search.highlight import (
        highlight,
        highlight_by_offsets,
        highlight_by_term_vectors,
    )
    from lucene_ray.search.reader import IndexReader

    ix, content = tv_offsets_index
    r = IndexReader(ix)
    terms = ["batch", "block", "merge", "the", "value"]
    for doc, text in enumerate(content):
        a = highlight(text, terms, fragment_chars=80)
        b = highlight_by_offsets(r, doc, text, terms, fragment_chars=80)
        c = highlight_by_term_vectors(r, doc, text, terms, fragment_chars=80)
        assert a == b == c, f"doc {doc}: FVH diverged"


def test_fvh_requires_offsets(tmp_path_factory, ray_session):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus
    from lucene_ray.search.highlight import highlight_by_term_vectors
    from lucene_ray.search.reader import IndexReader

    cd = str(tmp_path_factory.mktemp("fvh_nooff_corpus"))
    write_corpus(cd, n_docs=40, n_shards=1, seed=5, row_group_size=40)
    ix = str(tmp_path_factory.mktemp("fvh_nooff_index"))
    build_index(sorted(glob.glob(cd + "/*.parquet")), ix, term_vectors=True)
    r = IndexReader(ix)
    with pytest.raises(ValueError, match="without offsets"):
        highlight_by_term_vectors(r, 0, "x", ["x"])
