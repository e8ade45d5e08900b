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


# ---------------------------------------------------------------------------
# streaming-merge regression: chunked execution is invisible in the output,
# and peak memory stays O(chunk), not O(segment)


def test_chunked_merge_matches_oneshot(tmp_path, ray_session):
    import shutil

    from lucene_ray.index.merge import merge_segments

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=300, n_shards=1, seed=7, row_group_size=50)
    d1 = str(tmp_path / "ix1")
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d1, target_docs=50)
    d2 = str(tmp_path / "ix2")
    shutil.copytree(d1, d2)

    names = [e.name for e in read_manifest(d1).live_segments][:3]
    e1 = merge_segments(d1, names)  # default chunk: everything in one pass
    e2 = merge_segments(d2, names, batch_rows=16, max_chunk_pairs=300)

    assert (e1.sum_ttf, e1.unique_terms, e1.doc_count, e1.metrics["postings"]) == (
        e2.sum_ttf, e2.unique_terms, e2.doc_count, e2.metrics["postings"]
    )
    import os

    import pyarrow.parquet as pq

    t1 = pq.read_table(os.path.join(d1, "segments", e1.name, "postings.parquet"))
    t2 = pq.read_table(os.path.join(d2, "segments", e2.name, "postings.parquet"))
    assert t1.num_rows == t2.num_rows
    assert t1.equals(t2)  # identical rows — chunking never splits a term
    assert pq.ParquetFile(
        os.path.join(d2, "segments", e2.name, "postings.parquet")
    ).metadata.num_row_groups > 1  # the chunked path actually chunked


def _write_synth_merge_inputs(index_dir, n_segs=3, n_terms=15_000, ppt=100,
                              n_docs=20_000):
    """Synthetic term-sorted segments big enough that whole-segment decode
    would dominate RSS; built directly through the codec (no tokenize)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.codec.postings_codec import postings_table_from_pairs
    from lucene_ray.index.manifest import (
        Manifest,
        SegmentEntry,
        segment_dir,
        write_entry,
        write_manifest,
    )

    entries = []
    vocab = np.array([f"term{j:07d}" for j in range(n_terms)], dtype=object)
    for s in range(n_segs):
        pair_term = np.repeat(np.arange(n_terms), ppt)
        starts = (np.arange(n_terms) * 131) % (n_docs - ppt)
        docs = (starts[:, None] + np.arange(ppt)[None, :]).ravel().astype(np.int64)
        tfs = np.ones(n_terms * ppt, dtype=np.int64)
        pos = np.zeros(n_terms * ppt, dtype=np.uint32)
        norm_bytes = np.full(n_docs, 100, dtype=np.uint8)
        table = postings_table_from_pairs(
            vocab, pair_term, docs, tfs, pos, norm_bytes
        )
        name = f"seg_{s:06d}_synth"
        d = segment_dir(index_dir, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "postings.parquet"))
        pq.write_table(
            pa.table(
                {
                    "norm": pa.array(norm_bytes, type=pa.uint8()),
                    "doc_len": pa.array(
                        np.full(n_docs, ppt, dtype=np.int64), type=pa.int64()
                    ),
                }
            ),
            os.path.join(d, "norms.parquet"),
        )
        pq.write_table(
            pa.table({"doc": pa.array(np.arange(n_docs, dtype=np.int64))}),
            os.path.join(d, "stored.parquet"),
        )
        entries.append(
            SegmentEntry(
                name=name,
                docid_base=s * n_docs,
                doc_count=n_docs,
                sum_ttf=n_terms * ppt,
                unique_terms=n_terms,
                bytes=os.path.getsize(os.path.join(d, "postings.parquet")),
                input={"fingerprint": f"synth{s}"},
            )
        )
        write_entry(index_dir, entries[-1])
    write_manifest(
        index_dir,
        Manifest(
            generation=1,
            analyzer="code",
            doc_count=n_segs * n_docs,
            sum_ttf=n_segs * n_terms * ppt,
            segments=entries,
        ),
    )
    return [e.name for e in entries]


def _merge_rss_child(index_dir):
    """Child-process body for the peak-RSS assertion (own process so the
    high-watermark measures ONLY the merge, not the pytest session)."""
    import json
    import resource

    from lucene_ray.index.manifest import read_manifest
    from lucene_ray.index.merge import merge_segments

    m = read_manifest(index_dir)
    e = merge_segments(
        index_dir,
        [x.name for x in m.live_segments],
        max_chunk_pairs=500_000,
    )
    print(
        json.dumps(
            {
                "rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                / 1024.0,
                "postings": e.metrics["postings"],
                "unique_terms": e.unique_terms,
            }
        )
    )


def test_streaming_merge_bounded_rss(tmp_path):
    """An oversized merge (4.5M pairs) must NOT decode whole segments into
    RAM: the child's peak RSS stays within interpreter+chunk budget
    (VERDICT r2 finding #2 — whole-segment decode was several GB at the
    5 GB segment cap)."""
    import json
    import subprocess
    import sys

    index_dir = str(tmp_path / "synth_ix")
    names = _write_synth_merge_inputs(index_dir)
    assert len(names) == 3
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from tests.test_merge import _merge_rss_child; "
            f"_merge_rss_child({index_dir!r})",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
        timeout=300,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["postings"] == 3 * 15_000 * 100
    assert res["unique_terms"] == 15_000
    # interpreter + numpy/pyarrow imports are ~170 MB; the whole-segment
    # decode path peaked >600 MB on this input. The child peaks ~270 MB
    # standalone but ~430 MB when the full suite's Ray session loads the
    # host (allocator behavior under memory pressure) — the margin must
    # clear the in-suite number while still rejecting whole-segment decode:
    assert res["rss_mb"] < 520, f"merge RSS {res['rss_mb']:.0f} MB — not streaming"
