"""Index-time sorting (IndexWriterConfig.setIndexSort /
index/IndexSorter.java): docids permuted to field order at build, sorted
runs concatenated (not re-sorted) at merge, early-terminating sorted
collector equivalence with the generic dv-sort path."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.manifest import read_manifest
from lucene_ray.search.engine import IndexSearcher, fetch_stored, search_sorted
from lucene_ray.search.reader import IndexReader


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("is_corpus"))
    write_corpus(d, n_docs=400, n_shards=2, seed=31, row_group_size=50)
    return sorted(glob.glob(d + "/*.parquet"))


@pytest.fixture(scope="module")
def sorted_ix(corpus, tmp_path_factory, ray_session):
    ix = str(tmp_path_factory.mktemp("is_sorted"))
    build_index(corpus, ix, target_docs=100, index_sort=("n_chars", "desc"))
    return ix


@pytest.fixture(scope="module")
def plain_ix(corpus, tmp_path_factory, ray_session):
    ix = str(tmp_path_factory.mktemp("is_plain"))
    build_index(corpus, ix, target_docs=100)
    return ix


def _doc_ids(reader, docids) -> list[str]:
    """Logical doc identity via the stored path column — unique per corpus
    row (sorted-index docids are permuted)."""
    if len(docids) == 0:
        return []
    stored = fetch_stored(reader, docids)
    return stored.column("path").to_pylist()


def test_sorted_build_invariants(sorted_ix):
    m = read_manifest(sorted_ix)
    assert m.index_sort == ["n_chars", "desc"]
    r = IndexReader(sorted_ix)
    seen = set()
    for e in m.live_segments:
        assert e.sorted_runs == [[0, e.doc_count]]
        dv = r.segment_reader(e.name).doc_values("n_chars")
        assert (np.diff(dv) <= 0).all(), "segment not n_chars-descending"
        seen.update(
            _doc_ids(r, np.arange(e.docid_base, e.docid_base + e.doc_count))
        )
    assert len(seen) == m.doc_count  # a permutation, nothing lost


def test_sorted_search_matches_plain(sorted_ix, plain_ix):
    """search_sorted on the sorted index (early-terminating path) returns
    the same logical docs, in the same order, as the generic dv-sort on
    the unsorted index — both directions."""
    s_sorted = IndexSearcher(sorted_ix)
    s_plain = IndexSearcher(plain_ix)
    for term in ("merge", "window", "batch"):
        for asc in (False, True):
            a = search_sorted(s_sorted, term, "n_chars", k=25, ascending=asc)
            b = search_sorted(s_plain, term, "n_chars", k=25, ascending=asc)
            ids_a = _doc_ids(s_sorted.reader, a.docids)
            ids_b = _doc_ids(s_plain.reader, b.docids)
            assert list(a.values) == list(b.values), (term, asc)
            assert ids_a == ids_b, (term, asc)


def test_early_termination_prunes_candidates(sorted_ix, monkeypatch):
    """The sorted-direction query must fetch doc values for at most
    k x runs candidates, not the full match set."""
    import lucene_ray.search.engine as eng

    calls = []
    real = eng.fetch_doc_values

    def spy(reader, docids, field):
        calls.append(len(docids))
        return real(reader, docids, field)

    monkeypatch.setattr(eng, "fetch_doc_values", spy)
    s = IndexSearcher(sorted_ix)
    k = 5
    td_all = s.search("merge", k=1 << 62)
    n_matches = len(td_all.docids)
    n_runs = sum(
        len(e.sorted_runs or []) for e in s.reader.manifest.live_segments
    )
    calls.clear()
    td = search_sorted(s, "merge", "n_chars", k=k, ascending=False)
    assert len(td.docids) == k
    assert calls and calls[0] <= k * n_runs < n_matches


def test_merge_concatenates_runs_and_stays_correct(
    corpus, plain_ix, tmp_path_factory, ray_session
):
    from lucene_ray.index.merge import force_merge

    ix = str(tmp_path_factory.mktemp("is_merge"))
    build_index(corpus, ix, target_docs=100, index_sort=("n_chars", "desc"))
    n_segs = len(read_manifest(ix).live_segments)
    m = force_merge(ix)
    assert len(m.live_segments) == 1
    assert m.index_sort == ["n_chars", "desc"]
    runs = m.live_segments[0].sorted_runs
    assert len(runs) == n_segs  # concatenated, not re-sorted
    assert runs[0][0] == 0 and runs[-1][1] == m.doc_count

    s = IndexSearcher(ix)
    s_plain = IndexSearcher(plain_ix)
    a = search_sorted(s, "merge", "n_chars", k=20, ascending=False)
    b = search_sorted(s_plain, "merge", "n_chars", k=20, ascending=False)
    assert _doc_ids(s.reader, a.docids) == _doc_ids(s_plain.reader, b.docids)


def test_dv_update_drops_sort_invariant(corpus, tmp_path_factory, ray_session):
    """An n_chars DV update can break the sort order: the updated segment
    must fall back (and results must follow the NEW values)."""
    from lucene_ray.index.writer import update_numeric_docvalues

    ix = str(tmp_path_factory.mktemp("is_dv"))
    build_index(corpus, ix, target_docs=100, index_sort=("n_chars", "desc"))
    s = IndexSearcher(ix)
    top = search_sorted(s, "merge", "n_chars", k=3, ascending=False)
    victim_path = _doc_ids(s.reader, top.docids[:1])[0]
    # shrink every doc containing 'merge' to n_chars=1: the former top hits
    # must vanish from the desc top-k in favor of non-matching... they all
    # match, so order collapses to docid-asc — the early path must NOT be
    # used for the updated segments
    n = update_numeric_docvalues(ix, "merge", "n_chars", 1)
    assert n > 0
    s2 = IndexSearcher(ix)
    td = search_sorted(s2, "merge", "n_chars", k=3, ascending=False)
    assert list(td.values) == [1, 1, 1]
    # with every match at value 1, ordering is docid asc: the old top doc
    # keeps its spot only if it happens to be the smallest docid
    assert td.docids.tolist() == sorted(
        s2.search("merge", k=1 << 62).docids.tolist()
    )[:3]
    # the updated segment's early path is disabled via dv_gen, runs intact
    m = read_manifest(ix)
    assert any(getattr(e, "dv_gen", 0) > 0 for e in m.live_segments)


def test_term_search_doc_sets_equal(sorted_ix, plain_ix):
    s_sorted = IndexSearcher(sorted_ix)
    s_plain = IndexSearcher(plain_ix)
    for q in ("merge", "merge sort", '"merge sort"'):
        a = s_sorted.search(q, k=1 << 62)
        b = s_plain.search(q, k=1 << 62)
        assert set(_doc_ids(s_sorted.reader, a.docids)) == set(
            _doc_ids(s_plain.reader, b.docids)
        ), q


def test_search_after_field_sort_paginates(plain_ix):
    """searchAfter over a field sort (TopFieldCollector FieldDoc cursor):
    walking pages of 7 with after=(last value, last docid) reproduces the
    single big sorted result, no doc skipped or repeated — both
    directions, numeric and string fields."""
    s = IndexSearcher(plain_ix)
    for field in ("n_chars", "lang"):
        for asc in (False, True):
            full = search_sorted(s, "merge", field, k=10_000, ascending=asc)
            pages = []
            after = None
            while True:
                pg = search_sorted(
                    s, "merge", field, k=7, ascending=asc, after=after
                )
                if len(pg.docids) == 0:
                    break
                pages.extend(zip(pg.docids.tolist(), list(pg.values)))
                after = (pg.values[-1], int(pg.docids[-1]))
            assert pages == list(
                zip(full.docids.tolist(), list(full.values))
            ), (field, asc)


def test_search_after_skips_cursor_ties(plain_ix):
    """Equal field values tie-break docid-asc; the cursor must resume
    strictly after (value, docid), keeping later ties with the same value."""
    s = IndexSearcher(plain_ix)
    full = search_sorted(s, "merge", "lang", k=10_000, ascending=True)
    mid = len(full.docids) // 2
    after = (full.values[mid], int(full.docids[mid]))
    rest = search_sorted(s, "merge", "lang", k=10_000, ascending=True, after=after)
    assert rest.docids.tolist() == full.docids.tolist()[mid + 1 :]
