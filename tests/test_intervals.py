"""Intervals queries: the minimal-interval algebra fuzzed against a
brute-force enumerate-then-minimal-filter oracle, plus engine integration
(queries/.../intervals/ parity — SURVEY §2.11 intervals row)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.search import intervals as iv


def _minimal(cands):
    best = {}
    for s, e, g in cands:
        best.setdefault((s, e), g)
    keys = sorted(best)
    return sorted(
        (s, e, best[(s, e)])
        for (s, e) in keys
        if not any((s2 >= s and e2 <= e) and (s2, e2) != (s, e) for (s2, e2) in keys)
    )


def _brute(src, pos_of):
    """Reference: enumerate EVERY combination, then minimal-filter."""

    def all_ivs(s):
        if isinstance(s, iv.ITerm):
            return [(int(p), int(p), 0) for p in pos_of(s.term)]
        if isinstance(s, (iv.IOrdered, iv.IPhrase)):
            subs = [_minimal(all_ivs(c)) for c in s.sources]
            out = []
            for combo in itertools.product(*subs):
                ok = True
                gaps = combo[0][2]
                for a, b in zip(combo, combo[1:]):
                    if b[0] <= a[1] or (
                        isinstance(s, iv.IPhrase) and b[0] != a[1] + 1
                    ):
                        ok = False
                        break
                    gaps += b[2] + (b[0] - a[1] - 1)
                if ok:
                    out.append((combo[0][0], combo[-1][1], gaps))
            return out
        if isinstance(s, iv.IUnordered):
            subs = [_minimal(all_ivs(c)) for c in s.sources]
            out = []
            for combo in itertools.product(*subs):
                st = min(c[0] for c in combo)
                en = max(c[1] for c in combo)
                by = sorted(combo)
                gaps = sum(c[2] for c in combo)
                reach = by[0][1]
                for c in by[1:]:
                    if c[0] > reach + 1:
                        gaps += c[0] - reach - 1
                    reach = max(reach, c[1])
                out.append((st, en, gaps))
            return out
        if isinstance(s, iv.IOr):
            out = []
            for c in s.sources:
                out.extend(all_ivs(c))
            return out
        if isinstance(s, iv.IMaxGaps):
            return [x for x in _minimal(all_ivs(s.source)) if x[2] <= s.n]
        if isinstance(s, iv.IMaxWidth):
            return [
                x for x in _minimal(all_ivs(s.source)) if x[1] - x[0] + 1 <= s.n
            ]
        if isinstance(s, (iv.IContaining, iv.INotContaining)):
            big = _minimal(all_ivs(s.big))
            small = _minimal(all_ivs(s.small))
            want = isinstance(s, iv.IContaining)
            return [
                b
                for b in big
                if any(b[0] <= x[0] and x[1] <= b[1] for x in small) == want
            ]
        if isinstance(s, (iv.IContainedBy, iv.INotContainedBy)):
            small = _minimal(all_ivs(s.small))
            big = _minimal(all_ivs(s.big))
            want = isinstance(s, iv.IContainedBy)
            return [
                x
                for x in small
                if any(b[0] <= x[0] and x[1] <= b[1] for b in big) == want
            ]
        raise TypeError(s)

    return _minimal(all_ivs(src))


FUZZ_SOURCES = [
    iv.ordered("a", "b"),
    iv.ordered("a", "b", "c"),
    iv.unordered("a", "b"),
    iv.unordered("a", "b", "c"),
    iv.phrase("a", "b"),
    iv.phrase("a", "b", "c"),
    iv.or_("a", iv.phrase("b", "c")),
    iv.maxgaps(1, iv.ordered("a", "b")),
    iv.maxgaps(0, iv.unordered("a", "b")),
    iv.maxwidth(4, iv.unordered("a", "b", "c")),
    iv.containing(iv.unordered("a", "c"), iv.term("b")),
    iv.contained_by(iv.term("b"), iv.unordered("a", "c")),
    iv.not_containing(iv.unordered("a", "c"), iv.term("b")),
    iv.not_contained_by(iv.term("b"), iv.unordered("a", "c")),
    iv.ordered(iv.or_("a", "b"), "c"),
    iv.unordered(iv.ordered("a", "b"), "d"),
    iv.containing(iv.maxwidth(5, iv.unordered("a", "b")), iv.term("c")),
]


def test_algebra_matches_bruteforce_fuzz():
    rng = np.random.default_rng(17)
    for _ in range(300):
        n = int(rng.integers(3, 14))
        doc = rng.choice(list("abcd"), n)
        posmap = {t: np.nonzero(doc == t)[0] for t in "abcd"}

        def pos_of(t):
            return posmap.get(t, np.array([], dtype=int))

        for src in FUZZ_SOURCES:
            got = sorted(iv.eval_source(src, pos_of))
            want = _brute(src, pos_of)
            assert got == want, (src, "".join(doc), got, want)


def test_minimality_invariant():
    """No returned interval contains another (IntervalsSource contract)."""
    rng = np.random.default_rng(3)
    for _ in range(100):
        doc = rng.choice(list("abcd"), int(rng.integers(4, 16)))
        posmap = {t: np.nonzero(doc == t)[0] for t in "abcd"}

        def pos_of(t):
            return posmap.get(t, np.array([], dtype=int))

        for src in FUZZ_SOURCES:
            ivs = iv.eval_source(src, pos_of)
            for a in ivs:
                for b in ivs:
                    if a is not b:
                        assert not (b[0] >= a[0] and b[1] <= a[1]), (src, a, b, doc)


def test_containing_needs_minimality():
    """The planted case where a naive exists-window oracle diverges: the
    wide (a, b) pair contains c, but the minimal pair does not."""
    doc = list("a..c.ab...".replace(".", "x"))
    posmap = {t: np.array([i for i, ch in enumerate(doc) if ch == t]) for t in "abcx"}

    def pos_of(t):
        return posmap.get(t, np.array([], dtype=int))

    pairs = iv.eval_source(iv.unordered("a", "b"), pos_of)
    assert pairs == [(5, 6, 0)]  # the wide (0, 6) window is non-minimal
    assert iv.eval_source(
        iv.containing(iv.unordered("a", "b"), iv.term("c")), pos_of
    ) == []


def test_source_terms_and_candidates():
    src = iv.containing(
        iv.maxwidth(9, iv.unordered("x", iv.or_("y", "z"))), iv.term("w")
    )
    assert iv.source_terms(src) == ("w", "x", "y", "z")


@pytest.fixture(scope="module")
def iv_index(tmp_path_factory, ray_session):
    import glob

    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus

    cd = str(tmp_path_factory.mktemp("iv_corpus"))
    write_corpus(cd, n_docs=200, n_shards=2, seed=23, row_group_size=50)
    ix = str(tmp_path_factory.mktemp("iv_index"))
    build_index(sorted(glob.glob(cd + "/*.parquet")), ix, target_docs=60)
    import pyarrow.parquet as pq

    content = pa.concat_tables(
        [pq.read_table(p, columns=["content"]) for p in sorted(glob.glob(cd + "/*.parquet"))]
    ).column("content").to_pylist()
    return ix, content


def test_engine_intervals_vs_per_doc_eval(iv_index):
    """interval_postings through the index == per-doc algebra over
    re-analyzed tokens, for every doc (doc set AND freq)."""
    from lucene_ray.analysis import CodeAnalyzer
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery, IntervalQuery

    ix, content = iv_index
    s = IndexSearcher(ix)
    an = CodeAnalyzer()
    toks = [an.tokenize_text(t) for t in content]
    sources = [
        iv.maxgaps(3, iv.ordered("merge", "sort")),
        iv.maxwidth(8, iv.unordered("batch", "window")),
        iv.phrase("merge", "sort"),
        iv.or_(iv.phrase("merge", "sort"), iv.term("window")),
        iv.containing(iv.maxwidth(12, iv.unordered("merge", "sort")), iv.term("key")),
    ]
    for src in sources:
        td = s.search(BooleanQuery(should=[IntervalQuery(src)]), 1_000_000)
        got = set(td.docids.tolist())
        want = set()
        for d, tk in enumerate(toks):
            arr = np.asarray(tk, dtype=object)

            def pos_of(t, arr=arr):
                return np.nonzero(arr == t)[0]

            if iv.eval_source(src, pos_of):
                want.add(d)
        assert got == want, (src, got ^ want)


def test_intervals_requires_positions(tmp_path, ray_session):
    import glob

    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus
    from lucene_ray.search.engine import IndexSearcher
    from lucene_ray.search.query import BooleanQuery, IntervalQuery

    cd = str(tmp_path / "c")
    write_corpus(cd, n_docs=60, n_shards=1, seed=5, row_group_size=30)
    ix = str(tmp_path / "ix")
    build_index(sorted(glob.glob(cd + "/*.parquet")), ix, index_options="freqs")
    s = IndexSearcher(ix)
    with pytest.raises(ValueError, match="without positions"):
        s.search(
            BooleanQuery(should=[IntervalQuery(iv.ordered("merge", "sort"))]),
            10,
        )
