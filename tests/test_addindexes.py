"""IndexWriter.addIndexes (no-merge Directory copy): imported segments are
byte-identical with rebased docids; results equal a single combined index;
tombstones, doc values, and term vectors travel; analyzer mismatch rejected."""

import glob
import shutil

import numpy as np
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.checkindex import check_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.merge import TieredMergePolicy, maybe_merge
from lucene_ray.index.writer import add_indexes, delete_docs
from lucene_ray.search.engine import IndexSearcher
from lucene_ray.search.query import BooleanQuery, TermQuery
from lucene_ray.search.reader import IndexReader

QUERIES = ["def", "return", "import", "data", "x1"]


def _doc_sets(ix: str) -> dict:
    s = IndexSearcher(ix)
    return {
        q: sorted(s.search(BooleanQuery(must=[TermQuery(q)]), 10**6).docids.tolist())
        for q in QUERIES
    }


@pytest.mark.usefixtures("ray_session")
def test_addindexes_equals_combined(tmp_path):
    corpus = str(tmp_path / "corpus")
    paths = write_corpus(corpus, n_docs=400, n_shards=2, seed=21, row_group_size=50)
    paths = sorted(glob.glob(corpus + "/*.parquet"))
    combined = str(tmp_path / "ix_all")
    build_index(paths, combined, target_docs=50)
    a = str(tmp_path / "ix_a")
    b = str(tmp_path / "ix_b")
    build_index(paths[:1], a, target_docs=50)
    build_index(paths[1:], b, target_docs=50)
    add_indexes(a, [b])
    r = IndexReader(a)
    rc = IndexReader(combined)
    assert r.doc_count == rc.doc_count == 400
    assert r.sum_ttf == rc.sum_ttf
    assert _doc_sets(a) == _doc_sets(combined)
    assert check_index(a, verify_content=False)["ok"]
    # imported segments are mergeable like native ones
    maybe_merge(a, TieredMergePolicy(), use_ray=False)
    assert _doc_sets(a) == _doc_sets(combined)
    assert check_index(a, verify_content=False)["ok"]


@pytest.mark.usefixtures("ray_session")
def test_addindexes_carries_tombstones_and_tv(tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=200, n_shards=2, seed=9, row_group_size=50)
    paths = sorted(glob.glob(corpus + "/*.parquet"))
    a = str(tmp_path / "ix_a")
    b = str(tmp_path / "ix_b")
    build_index(paths[:1], a, target_docs=50, term_vectors=True)
    build_index(paths[1:], b, target_docs=50, term_vectors=True)
    dead_in_b = [0, 7]
    delete_docs(b, dead_in_b)
    n_a = IndexReader(a).doc_count
    base_sets = {**_doc_sets(a)}
    add_indexes(a, [b])
    r = IndexReader(a)
    assert r.doc_count == 200
    # tombstones rebased: the deleted docs never match
    s = IndexSearcher(a)
    for q in QUERIES:
        hits = set(s.search(BooleanQuery(must=[TermQuery(q)]), 10**6).docids.tolist())
        for d in dead_in_b:
            assert n_a + d not in hits
    # term vectors fetch across the import boundary with global ids
    tv = r.term_vectors(np.array([1, n_a + 1, n_a + 50]))
    assert set(tv.column("doc").to_pylist()) <= {1, n_a + 1, n_a + 50}
    assert tv.num_rows > 0
    assert check_index(a, verify_content=False)["ok"]


@pytest.mark.usefixtures("ray_session")
def test_addindexes_analyzer_mismatch(tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=60, n_shards=1, seed=4, row_group_size=30)
    paths = sorted(glob.glob(corpus + "/*.parquet"))
    a = str(tmp_path / "ix_a")
    b = str(tmp_path / "ix_b")
    build_index(paths, a, target_docs=30)
    build_index(paths, b, target_docs=30, analyzer_name="english")
    with pytest.raises(ValueError, match="analyzer mismatch"):
        add_indexes(a, [b])
