"""QueryProfilerIndexSearcher (search/profiler.py) — profile-tree
structure, phase breakdown, and result identity with the unwrapped
search (sandbox/search/QueryProfilerIndexSearcher.java)."""

import glob

import pytest

from lucene_ray.search.engine import IndexSearcher
from lucene_ray.search.profiler import QueryProfilerIndexSearcher


@pytest.fixture(scope="module")
def ix(tmp_path_factory, ray_session):
    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus

    corpus = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(corpus, n_docs=200, n_shards=2, seed=5, row_group_size=100)
    d = str(tmp_path_factory.mktemp("pix"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=100)
    return d


def test_profile_matches_plain_search(ix):
    s = IndexSearcher(ix)
    p = QueryProfilerIndexSearcher(s)
    for q in ("merge", "merge sort", "+merge -sort batch"):
        plain = s.search(q, 10)
        out = p.profile(q, 10)
        assert out.topdocs.docids.tolist() == plain.docids.tolist()
        assert out.topdocs.total_hits == plain.total_hits


def test_profile_tree_shape_and_timers(ix):
    s = IndexSearcher(ix)
    p = QueryProfilerIndexSearcher(s)
    out = p.profile("merge sort batch", 10)
    root = out.profile
    assert root.query_type == "BooleanQuery"
    assert len(root.children) == 3  # one node per clause
    for c in root.children:
        assert c.query_type == "TermQuery"
        assert c.breakdown["create_weight"] >= 0
        assert c.breakdown["create_weight_count"] == 1
    assert root.breakdown["segments"] == len(s.reader.segments)
    assert root.breakdown["hits"] == out.topdocs.total_hits
    assert out.rewrite_ns >= 0 and out.collect_ns > 0
    assert root.total_time_ns() >= root.time_ns


def test_profile_nested_children(ix):
    from lucene_ray.search.query import parse_query

    s = IndexSearcher(ix)
    p = QueryProfilerIndexSearcher(s)
    out = p.profile(parse_query("(merge OR sort) AND batch", s.analyzer), 10)
    types = {c.query_type for c in out.profile.children}
    assert "DisjunctionSumQuery" in types
    dis = next(
        c for c in out.profile.children if c.query_type == "DisjunctionSumQuery"
    )
    assert len(dis.children) == 2  # the two disjuncts profile as children
