"""TieredMergePolicy decision tests (TestTieredMergePolicy-style invariants)
and merge execution: logical postings + search results unchanged by merging."""

import glob

import numpy as np
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.checkindex import check_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.manifest import SegmentEntry, read_manifest
from lucene_ray.index.merge import TieredMergePolicy, force_merge, maybe_merge
from lucene_ray.search.engine import IndexSearcher


def seg(name, base, docs, nbytes):
    return SegmentEntry(
        name=name, docid_base=base, doc_count=docs, sum_ttf=docs * 10,
        unique_terms=5, bytes=nbytes,
    )


def mk_segments(sizes):
    out, base = [], 0
    for i, b in enumerate(sizes):
        out.append(seg(f"s{i}", base, 100, b))
        base += 100
    return out


class TestPolicy:
    def test_under_budget_no_merge(self):
        p = TieredMergePolicy()
        # few segments below segsPerTier -> allowed >= 10 -> nothing to do
        assert p.find_merges(mk_segments([5 << 20] * 5)) == []

    def test_over_budget_merges_uniform(self):
        p = TieredMergePolicy()
        specs = p.find_merges(mk_segments([3 << 20] * 25))
        assert specs, "25 equal segments must trigger merging"
        for s in specs:
            assert 2 <= len(s) <= p.max_merge_at_once

    def test_windows_are_adjacent(self):
        p = TieredMergePolicy()
        segments = mk_segments([3 << 20] * 30)
        by_name = {e.name: e for e in segments}
        for spec in p.find_merges(segments):
            es = sorted((by_name[n] for n in spec), key=lambda e: e.docid_base)
            for a, b in zip(es, es[1:]):
                assert b.docid_base == a.docid_base + a.doc_count

    def test_max_merged_segment_cap(self):
        p = TieredMergePolicy(max_merged_segment_bytes=100 << 20)
        # oversized segments (> max/2) are ineligible
        segments = mk_segments([80 << 20] * 4 + [1 << 20] * 30)
        for spec in p.find_merges(segments):
            names = set(spec)
            assert not names & {"s0", "s1", "s2", "s3"}

    def test_skew_score_prefers_balanced(self):
        p = TieredMergePolicy()
        balanced = p.score([10 << 20] * 5, False)
        lopsided = p.score([50 << 20] + [1 << 20] * 4, False)
        assert balanced < lopsided

    def test_anti_quadratic_rule(self):
        p = TieredMergePolicy()
        # one big + one tiny adjacent: result < 1.5x big -> rejected
        segments = mk_segments([100 << 20, 1 << 20])
        assert p.find_merges(segments) == []


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(corpus, n_docs=900, n_shards=3, seed=3, row_group_size=60)
    d = str(tmp_path_factory.mktemp("index"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=60)
    return d


def _topk_fingerprint(index_dir, queries, k=10):
    s = IndexSearcher(index_dir, pruned=False)
    out = {}
    for q in queries:
        td = s.search(q, k)
        out[q] = [(int(d), float(sc)) for d, sc in zip(td.docids, td.scores)]
    return out


QUERIES = ["merge flush", "parse AND block", "getmanager", "read 500"]


def test_merge_preserves_results(built, ray_session):
    m0 = read_manifest(built)
    before = _topk_fingerprint(built, QUERIES)
    n_before = len(m0.live_segments)

    policy = TieredMergePolicy(floor_segment_bytes=1 << 20, segs_per_tier=4.0,
                               max_merge_at_once=4)
    m1 = maybe_merge(built, policy)
    assert len(m1.live_segments) < n_before
    assert m1.doc_count == m0.doc_count
    assert m1.sum_ttf == m0.sum_ttf
    rep = check_index(built)
    assert rep["ok"], rep["problems"][:5]
    after = _topk_fingerprint(built, QUERIES)
    assert before == after  # identical docids AND float32 scores

    m2 = force_merge(built)
    assert len(m2.live_segments) == 1
    rep = check_index(built)
    assert rep["ok"], rep["problems"][:5]
    final = _topk_fingerprint(built, QUERIES)
    assert before == final


def test_merged_search_pruned_duel(built):
    ex = IndexSearcher(built, pruned=False)
    pr = IndexSearcher(built, pruned=True)
    for q in QUERIES:
        a, b = ex.search(q, 10), pr.search(q, 10)
        assert a.docids.tolist() == b.docids.tolist()
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)
