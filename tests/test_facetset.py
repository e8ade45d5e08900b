"""Facet sets (search/facetset.py — facet/facetset package): pack/decode
round trip, matcher algebra, per-set vs per-doc counting, deletes, merge
survival."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.search.facetset import (
    ExactFacetSetMatcher,
    RangeFacetSetMatcher,
    decode_facet_sets,
    derive_fsets,
    matching_facet_sets_counts,
    pack_facet_sets,
)

SF = "/root/testdata/sf0.001"


def test_pack_decode_roundtrip():
    sets = np.array([[1, 2, 3, 4], [5, 6, 7, 8], [0, 0, 9, 9]], dtype=np.int64)
    _, rows = pack_facet_sets(sets)
    blobs = [bytes(r) for r in rows]
    counts, vals = decode_facet_sets(blobs)
    assert counts.tolist() == [2, 2, 2]  # two 2-dim sets per doc
    assert vals.tolist() == [
        [1, 2], [3, 4], [5, 6], [7, 8], [0, 0], [9, 9],
    ]
    # empty blob decodes to zero sets
    c2, v2 = decode_facet_sets([b"", blobs[0]])
    assert c2.tolist() == [0, 2] and len(v2) == 2


def test_derive_fsets_matches_formula():
    t = pa.table({"content": ["abc", "x" * 12, None]})
    counts, vals = decode_facet_sets(derive_fsets(t).to_pylist())
    assert counts.tolist() == [2, 2, 2]
    assert vals.tolist() == [
        [3 % 7, 3 % 10], [3 % 13, 3 % 5],
        [12 % 7, 12 % 10], [12 % 13, 12 % 5],
        [0, 0], [0, 0],
    ]


def test_matcher_algebra():
    vals = np.array([[1, 2], [3, 4], [1, 4]], dtype=np.int64)
    assert ExactFacetSetMatcher("e", (1, 2)).matches_matrix(vals).tolist() == [
        True, False, False,
    ]
    m = RangeFacetSetMatcher("r", (1, 2), (3, 4))
    assert m.matches_matrix(vals).tolist() == [True, True, True]
    m2 = RangeFacetSetMatcher("r2", (2, 0), (9, 9))
    assert m2.matches_matrix(vals).tolist() == [False, True, False]
    with pytest.raises(ValueError, match="dims"):
        ExactFacetSetMatcher("bad", (1, 2, 3)).matches_matrix(vals)


@pytest.fixture(scope="module")
def fset_index(ray_session, tmp_path_factory):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import documents_as_corpus
    from lucene_ray.index.merge import TieredMergePolicy, maybe_merge

    ix = str(tmp_path_factory.mktemp("fsets") / "ix")
    build_index(
        [documents_as_corpus(SF)], ix, target_docs=128,
        binary_dv_fields=("fsets",),
    )
    maybe_merge(ix, TieredMergePolicy(), use_ray=False)
    return ix


def _truth():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    return (
        t.column("doc_id").to_numpy().astype(np.int64),
        t.column("n_chars").to_numpy().astype(np.int64),
    )


def test_counts_match_bruteforce_after_merge(fset_index):
    from lucene_ray.search.reader import IndexReader

    ids, ln = _truth()
    matchers = [
        ExactFacetSetMatcher("e", (3, 5)),
        RangeFacetSetMatcher("r", (2, 3), (5, 8)),
    ]
    rows, tot = matching_facet_sets_counts(
        IndexReader(fset_index), "fsets", matchers
    )
    s1 = np.stack([ln % 7, ln % 10], axis=1)
    s2 = np.stack([ln % 13, ln % 5], axis=1)
    e_hits = [(s == [3, 5]).all(axis=1) for s in (s1, s2)]
    r_hits = [
        ((s >= [2, 3]) & (s <= [5, 8])).all(axis=1) for s in (s1, s2)
    ]
    assert rows[0] == ("e", int(sum(h.sum() for h in e_hits)))
    assert rows[1] == ("r", int(sum(h.sum() for h in r_hits)))
    any_doc = np.zeros(len(ids), dtype=bool)
    for h in e_hits + r_hits:
        any_doc |= h
    assert tot == int(any_doc.sum())


def test_counts_skip_deleted(ray_session, tmp_path):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import documents_as_corpus
    from lucene_ray.index.writer import delete_docs
    from lucene_ray.search.reader import IndexReader

    ix = str(tmp_path / "ix")
    build_index(
        [documents_as_corpus(SF)], ix, target_docs=512,
        binary_dv_fields=("fsets",),
    )
    m = [RangeFacetSetMatcher("all", (0, 0), (99, 99))]
    rows0, tot0 = matching_facet_sets_counts(IndexReader(ix), "fsets", m)
    delete_docs(ix, [0, 1, 2, 3, 4])
    rows1, tot1 = matching_facet_sets_counts(IndexReader(ix), "fsets", m)
    assert tot1 == tot0 - 5
    assert rows1[0][1] == rows0[0][1] - 10  # two sets per deleted doc
