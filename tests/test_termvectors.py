"""Term-vectors sidecar (TermVectorsFormat analog): per-doc (term, freq,
positions[, offsets]) rows, doc-major row-group-pruned fetches, merge/delete
survival, and the MLT fast path sourced from vectors instead of
re-analysis."""

import glob
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.index.builder import build_index, build_term_vectors
from lucene_ray.index.corpus import write_corpus
from lucene_ray.index.merge import force_merge
from lucene_ray.index.writer import delete_docs
from lucene_ray.search.reader import IndexReader


def _tv_dict(tv: pa.Table) -> dict:
    """{doc: {term: (freq, positions)}} from a term-vectors table."""
    out: dict = {}
    for row in tv.to_pylist():
        out.setdefault(row["doc"], {})[row["term"]] = (
            row["freq"],
            row["positions"],
        )
    return out


@pytest.fixture(scope="module")
def tv_index(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("corpus_tv"))
    write_corpus(corpus, n_docs=300, n_shards=2, seed=11, row_group_size=50)
    d = str(tmp_path_factory.mktemp("ix_tv"))
    build_index(
        sorted(glob.glob(corpus + "/*.parquet")),
        d,
        target_docs=50,
        term_vectors=True,
    )
    return d


def test_kernel_matches_tokenizer():
    an = get_analyzer("code")
    texts = pa.array(["the big catBig bigDog", "", "solo big big solo"])
    row_idx, terms, pos = an.tokenize_flat(texts)
    tv = build_term_vectors(row_idx, terms, pos)
    got = _tv_dict(tv)
    for i, text in enumerate(texts.to_pylist()):
        toks = an.tokenize_text(text)
        want = Counter(toks)
        have = got.get(i, {})
        assert {t: f for t, (f, _) in have.items()} == dict(want)
        for t, (_, plist) in have.items():
            assert plist == [p for p, tok in enumerate(toks) if tok == t]
    # doc-major, term-sorted within doc
    docs = tv.column("doc").to_pylist()
    assert docs == sorted(docs)


def test_reader_fetch_matches_reanalysis(tv_index):
    r = IndexReader(tv_index)
    assert r.has_term_vectors
    an = get_analyzer("code")
    want_ids = np.array([0, 7, 49, 50, 123, 299], dtype=np.int64)
    tv = _tv_dict(r.term_vectors(want_ids))
    for gid in want_ids:
        sr, local = r.locate(int(gid))
        # stored.parquet keeps no content column, so cross-check against the
        # index invariants instead: freq sums == doc_len (norms), and each
        # term's freq == the postings tf for this doc
        have = tv.get(int(gid), {})
        assert sum(f for f, _ in have.values()) == sr.doc_len[local]
        for t, (f, plist) in list(have.items())[:5]:
            tp = sr.postings(t)
            j = np.searchsorted(tp.docids, local)
            assert tp.docids[j] == local and tp.tfs[j] == f
            assert len(plist) == f


def test_rowgroup_pruning_single_doc(tv_index):
    r = IndexReader(tv_index)
    sr = r.segment_reader(r.segments[0].name)
    t = sr.term_vectors_local(np.array([3], dtype=np.int64))
    assert set(t.column("doc").to_pylist()) == {3}
    # empty request, out-of-range request
    assert sr.term_vectors_local(np.array([], dtype=np.int64)).num_rows == 0
    assert (
        sr.term_vectors_local(np.array([10**9], dtype=np.int64)).num_rows == 0
    )


def test_merge_and_deletes_fold(tv_index, tmp_path):
    import shutil

    d = str(tmp_path / "ix")
    shutil.copytree(tv_index, d)
    r0 = IndexReader(d)
    before = _tv_dict(r0.term_vectors(np.arange(300)))
    dead = [5, 60, 140, 299]
    assert delete_docs(d, dead) == len(dead)
    force_merge(d)
    r1 = IndexReader(d)
    assert len(r1.segments) == 1
    after = _tv_dict(r1.term_vectors(np.arange(300)))
    for gid in dead:
        assert gid not in after  # reclaimed with the postings
    for gid, terms in before.items():
        if gid not in dead:
            assert after[gid] == terms


def test_checkindex_covers_termvectors(tv_index, tmp_path):
    import shutil

    import pyarrow.parquet as pq

    from lucene_ray.index.checkindex import check_index
    from lucene_ray.index.manifest import segment_dir, read_manifest

    assert check_index(tv_index, verify_content=False)["ok"]
    # corrupt one freq -> CheckIndex must notice
    d = str(tmp_path / "ix")
    shutil.copytree(tv_index, d)
    m = read_manifest(d)
    sd = segment_dir(d, m.segments[0].name)
    t = pq.read_table(sd + "/termvectors.parquet")
    f = t.column("freq").to_pylist()
    f[0] += 1
    t = t.set_column(
        t.schema.get_field_index("freq"), "freq", pa.array(f, type=pa.int32())
    )
    pq.write_table(t, sd + "/termvectors.parquet")
    rep = check_index(d, verify_content=False)
    assert not rep["ok"] and any("termvectors" in p for p in rep["problems"])


def test_mlt_tv_matches_reanalysis(tv_index):
    from lucene_ray.search.mlt import select_mlt_terms, select_mlt_terms_from_tv

    r = IndexReader(tv_index)
    an = get_analyzer("code")
    for gid in (2, 33, 150, 250):
        # stored.parquet keeps no content column; rebuild the seed text from
        # the term vector itself (position-ordered terms) — both selectors
        # then see identical token streams
        tvt = r.term_vectors([gid])
        toks: list[tuple[int, str]] = []
        for row in tvt.to_pylist():
            toks.extend((p, row["term"]) for p in row["positions"])
        text = " ".join(t for _, t in sorted(toks))
        assert select_mlt_terms_from_tv(r, gid) == select_mlt_terms(
            r, text, an
        )


def test_offsets_variant_carries_occurrence_offsets(tmp_path, ray_session):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=60, n_shards=1, seed=5, row_group_size=30)
    d = str(tmp_path / "ix")
    build_index(
        sorted(glob.glob(corpus + "/*.parquet")),
        d,
        target_docs=30,
        index_options="offsets",
        term_vectors=True,
    )
    r = IndexReader(d)
    tv = r.term_vectors(np.arange(10))
    assert {"starts", "lens"} <= set(tv.column_names)
    # every occurrence list is aligned with its positions list
    for row in tv.to_pylist():
        assert len(row["starts"]) == len(row["positions"]) == row["freq"]
        assert all(ln > 0 for ln in row["lens"])


def test_checkindex_accepts_overlap_analyzer_tv(tmp_path, ray_session):
    """ADVICE r3: overlap analyzers (ngram grams of a repeated char) emit
    the same term twice at ONE position; check_index must accept equal
    adjacent TV positions when the segment has overlaps (the reference
    CheckIndex allows pos == lastPos)."""
    import pyarrow.parquet as pq

    from lucene_ray.index.checkindex import check_index

    n = 8
    rows = {
        "repo": ["r"] * n,
        "path": [f"f{i}.py" for i in range(n)],
        "commit": ["c"] * n,
        "lang": ["py"] * n,
        # 'll' inside 'hello'-like repeats yields duplicate grams at one
        # position under the ngram analyzer
        "content": [f"fulll hellllo x{i}" for i in range(n)],
    }
    src = str(tmp_path / "c.parquet")
    pq.write_table(pa.table(rows), src)
    d = str(tmp_path / "ix")
    build_index([src], d, analyzer_name="ngram", term_vectors=True)
    # the scenario is real: some (doc, term) TV row repeats a position
    rd = IndexReader(d)
    tv = rd.term_vectors(np.arange(n))
    has_dup = any(
        len(p) != len(set(p)) for p in tv.column("positions").to_pylist()
    )
    assert has_dup, "fixture no longer produces duplicate gram positions"
    res = check_index(d)
    assert res["problems"] == [], res["problems"]
