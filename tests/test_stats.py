"""Global stats pipelines (salted groupby) + stored-field fetch."""

import glob

import numpy as np
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.stats import assemble_term, build_global_postings, global_term_stats
from lucene_ray.search.engine import IndexSearcher, fetch_stored
from lucene_ray.search.reader import IndexReader


@pytest.fixture(scope="module")
def ix(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(corpus, n_docs=500, n_shards=2, seed=11, row_group_size=125)
    d = str(tmp_path_factory.mktemp("ix"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=125)
    return d


def test_global_term_stats_matches_reader(ix, ray_session):
    pdf = global_term_stats(ix).to_pandas()
    reader = IndexReader(ix)
    # spot-check 10 terms against the per-query stats path
    sample = pdf.sample(10, random_state=0)
    want = reader.global_term_stats(sample.term.tolist())
    for _, row in sample.iterrows():
        df, ttf = want[row.term]
        assert (row.df, row.ttf) == (df, ttf)
    assert pdf.df.sum() > 0
    # manifest sum_ttf is content-only; keyword-field 'f:v' terms are
    # excluded from the avgdl numerator
    content = pdf[~pdf.term.str.contains(':')]
    assert int(content.ttf.sum()) == reader.sum_ttf


def test_salted_global_postings(ix, ray_session):
    """Global lists assembled from salt buckets == per-segment postings
    concatenated with bases (the N-vs-4N logical-postings equality core)."""
    gp = build_global_postings(ix, salt_range=125).to_pandas()
    reader = IndexReader(ix)
    # every (term, salt) bucket is docid-range disjoint and sorted
    for term in ["merge", "getmanager", "read"]:
        docs, tfs = assemble_term(gp, term)
        want_docs, want_tfs = [], []
        for e in reader.segments:
            sr = reader.segment_reader(e.name)
            p = sr.postings(term)
            if p is not None:
                want_docs.extend((p.docids + e.docid_base).tolist())
                want_tfs.extend(p.tfs.tolist())
        assert docs.tolist() == want_docs
        assert tfs.tolist() == want_tfs
        assert np.all(np.diff(docs) > 0)


def test_fetch_stored(ix):
    s = IndexSearcher(ix)
    td = s.search("merge", 7)
    t = fetch_stored(s.reader, td.docids)
    assert t.num_rows == len(td.docids)
    assert t.column("docid").to_pylist() == td.docids.tolist()
    assert all(p.startswith("src/") for p in t.column("path").to_pylist())
    assert all(len(x) == 64 for x in t.column("content_sha256").to_pylist())
