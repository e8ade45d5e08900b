"""Round-4 ADVICE regression coverage: empty SORTED_NUMERIC per-doc lists
(trailing-empty crash, neighbor-value leak, CheckIndex boundary wrap),
FieldExistsQuery over the dv2 sidecars, and MemoryIndex phrase frequency.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.search.engine import (
    IndexSearcher,
    fetch_sorted_numeric_selected,
)
from lucene_ray.search.query import (
    BooleanQuery,
    FieldExistsQuery,
    SortedNumericRangeQuery,
)


def _corpus_with_empty_lists(path: str, n: int = 30) -> None:
    """Last doc (and one mid doc) carry an EMPTY sig_nums list — the
    user-supplied list<int64> column is cast verbatim by
    build_one_segment, so empties are representable (ADVICE r4)."""
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta"]
    nums = []
    for i in range(n):
        if i in (7, n - 1):
            nums.append([])
        else:
            nums.append(sorted(int(x) for x in rng.integers(0, 100, size=3)))
    rows = {
        "repo": ["r0"] * n,
        "path": [f"src/f{i}.py" for i in range(n)],
        "commit": ["c0"] * n,
        "lang": ["py"] * n,
        "content": [" ".join(rng.choice(words, size=8)) for _ in range(n)],
        "sig_nums": pa.array(nums, type=pa.list_(pa.int64())),
    }
    pq.write_table(pa.table(rows), path, row_group_size=16)


@pytest.fixture()
def empty_list_ix(tmp_path, ray_session):
    src = str(tmp_path / "corpus.parquet")
    _corpus_with_empty_lists(src)
    d = str(tmp_path / "ix")
    build_index([src], d, sorted_numeric_dv_fields=("sig_nums",))
    return d


class TestEmptySortedNumericLists:
    def test_range_query_with_trailing_empty_doc(self, empty_list_ix):
        """offsets[:-1] used to feed reduceat an index == len(flat) when
        the segment's LAST doc had an empty list -> IndexError."""
        s = IndexSearcher(empty_list_ix)
        td = s.search(
            BooleanQuery(must=[SortedNumericRangeQuery("sig_nums", 0, 100)]),
            1000,
        )
        hits = set(td.docids.tolist())
        assert 7 not in hits and 29 not in hits
        assert len(hits) == 28  # every non-empty doc has values in [0,100]

    def test_range_query_naive_parity(self, empty_list_ix, tmp_path):
        s = IndexSearcher(empty_list_ix)
        src = pq.read_table(str(tmp_path / "corpus.parquet"))
        lists = src.column("sig_nums").to_pylist()
        lo, hi = 20, 60
        want = {i for i, vs in enumerate(lists) if any(lo <= v <= hi for v in vs)}
        td = s.search(
            BooleanQuery(must=[SortedNumericRangeQuery("sig_nums", lo, hi)]),
            1000,
        )
        assert set(td.docids.tolist()) == want

    def test_selector_refuses_empty_doc(self, empty_list_ix):
        """min/max on an empty per-doc list must raise, never read a
        NEIGHBORING doc's value."""
        s = IndexSearcher(empty_list_ix)
        ok = fetch_sorted_numeric_selected(
            s.reader, np.array([0, 1, 2], dtype=np.int64), "sig_nums", "min"
        )
        assert len(ok) == 3
        for sel in ("min", "max"):
            with pytest.raises(ValueError, match="no.*values"):
                fetch_sorted_numeric_selected(
                    s.reader, np.array([7], dtype=np.int64), "sig_nums", sel
                )

    def test_field_exists_skips_empty_lists(self, empty_list_ix):
        """FieldExistsQuery on a SORTED_NUMERIC field = docs with a
        NON-EMPTY list (not the dense all-docs set)."""
        s = IndexSearcher(empty_list_ix)
        td = s.search(
            BooleanQuery(must=[FieldExistsQuery("sig_nums")]), 1000
        )
        hits = set(td.docids.tolist())
        assert hits == set(range(30)) - {7, 29}

    def test_checkindex_clean(self, empty_list_ix):
        from lucene_ray.index.checkindex import check_index

        assert check_index(empty_list_ix, verify_content=False)["problems"] == []


@pytest.mark.usefixtures("ray_session")
def test_checkindex_leading_empty_doc_no_mask(tmp_path, ray_session):
    """A LEADING empty doc (offs[1] == 0) used to wrap -1 to the LAST diff
    and mask a genuine descending pair at the tail of the final doc."""
    import shutil

    from lucene_ray.index.checkindex import check_index

    src = str(tmp_path / "corpus.parquet")
    n = 10
    nums = [[] if i == 0 else [5, 10, 15] for i in range(n)]
    rows = {
        "repo": ["r0"] * n,
        "path": [f"f{i}.py" for i in range(n)],
        "commit": ["c0"] * n,
        "lang": ["py"] * n,
        "content": ["alpha beta"] * n,
        "sig_nums": pa.array(nums, type=pa.list_(pa.int64())),
    }
    pq.write_table(pa.table(rows), src)
    ix = str(tmp_path / "ix")
    build_index([src], ix, sorted_numeric_dv_fields=("sig_nums",))
    assert check_index(ix, verify_content=False)["problems"] == []
    # corrupt: descending pair at the TAIL of the FINAL doc
    ix2 = str(tmp_path / "ix2")
    shutil.copytree(ix, ix2)
    segs = os.listdir(os.path.join(ix2, "segments"))
    p = os.path.join(
        ix2, "segments", segs[0], "docvalues_sortednumeric.parquet"
    )
    t = pq.read_table(p)
    col = t.column("sig_nums").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).copy()
    flat[-1] = flat[-2] - 3  # descending inside the last doc
    bad = pa.ListArray.from_arrays(col.offsets, pa.array(flat, type=pa.int64()))
    pq.write_table(t.set_column(0, "sig_nums", bad), p)
    probs = check_index(ix2, verify_content=False)["problems"]
    assert any("not ascending" in x for x in probs)


def test_memoryindex_phrase_frequency():
    """A doc containing the phrase twice must outscore one occurrence
    (memory/MemoryIndex scores with the real phrase frequency)."""
    from lucene_ray.search.memoryindex import MemoryIndex, _phrase_match_count

    once = MemoryIndex()
    once.add_field("content", "quick fox jumps over the lazy dog")
    twice = MemoryIndex()
    twice.add_field("content", "quick fox sat then quick fox ran away happily")
    s1 = once.search('"quick fox"')
    s2 = twice.search('"quick fox"')
    assert s1 > 0 and s2 > 0
    assert s2 > s1
    # counting kernel directly: exact + sloppy
    a = np.array([0, 5], dtype=np.int64)
    b = np.array([1, 6], dtype=np.int64)
    assert _phrase_match_count([a, b], 0) == 2
    assert _phrase_match_count([a, np.array([2], dtype=np.int64)], 0) == 0
    assert _phrase_match_count([a, np.array([2], dtype=np.int64)], 1) == 1
