"""Explanation trees (search/Explanation.java; BooleanWeight/TermWeight/
BM25Similarity.explain): root value bit-identical to search() scores,
details internally consistent, non-matches explained."""

import glob

import numpy as np
import pytest

from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.search.engine import IndexSearcher
from lucene_ray.search.query import BooleanQuery, MatchAllDocsQuery, TermQuery


@pytest.fixture(scope="module")
def ix(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(corpus, n_docs=400, n_shards=2, seed=9, row_group_size=128)
    d = str(tmp_path_factory.mktemp("ix"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=100)
    return d


QUERIES = [
    "merge",
    "merge flush index",
    "+merge flush",
    '"sort merge" batch',
    "merge^2 flush",
    "+(merge flush) index",
    "mer* flush",
]


class TestExplain:
    def test_root_value_equals_search_score(self, ix):
        s = IndexSearcher(ix, pruned=False)
        for q in QUERIES:
            td = s.search(q, 10)
            assert len(td.docids), q
            for d, score in zip(td.docids.tolist(), td.scores.tolist()):
                ex = s.explain(q, d)
                assert ex.is_match, (q, d)
                assert ex.value == pytest.approx(score, abs=0.0), (q, d)

    def test_leaf_values_sum_to_root(self, ix):
        s = IndexSearcher(ix, pruned=False)
        for q in QUERIES:
            td = s.search(q, 5)
            for d in td.docids.tolist():
                ex = s.explain(q, d)
                # canonical float32 order: summing leaf float32 values in
                # order reproduces the root exactly
                acc = np.float32(0.0)
                for det in ex.details:
                    acc = acc + np.float32(det.value)
                assert float(acc) == ex.value, (q, d)

    def test_bm25_detail_consistency(self, ix):
        s = IndexSearcher(ix, pruned=False)
        td = s.search("merge", 3)
        ex = s.explain("merge", int(td.docids[0]))
        leaf = ex.details[0]
        boost, idf, tf = (d.value for d in leaf.details)
        assert leaf.value == pytest.approx(boost * idf * tf, rel=1e-5)
        assert "idf" in leaf.details[1].description
        assert "tf" in leaf.details[2].description

    def test_non_match_reasons(self, ix):
        s = IndexSearcher(ix, pruned=False)
        # a doc that matches 'flush' but not 'merge'
        all_m = set(s.search("merge", 10_000_000).docids.tolist())
        only_f = [
            d for d in s.search("flush", 10_000_000).docids.tolist()
            if d not in all_m
        ]
        assert only_f
        ex = s.explain("+merge flush", only_f[0])
        assert not ex.is_match and "required" in ex.description
        ex2 = s.explain("flush -flush", only_f[0])
        assert not ex2.is_match and "prohibited" in ex2.description
        ex3 = s.explain(
            BooleanQuery(should=[TermQuery("merge"), TermQuery("flush")],
                         min_should_match=2),
            only_f[0],
        )
        assert not ex3.is_match and "minimumShouldMatch" in ex3.description

    def test_deleted_doc_explained(self, tmp_path, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_ray.index.writer import delete_docs

        rows = [
            {"repo": "r", "path": f"p{i}", "commit": "c", "lang": "py",
             "content": "merge flush"}
            for i in range(30)
        ]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        d = str(tmp_path / "ix")
        build_index([src], d, target_docs=10)
        delete_docs(d, [4])
        s = IndexSearcher(d)
        ex = s.explain("merge", 4)
        assert not ex.is_match and "deleted" in ex.description

    def test_str_rendering(self, ix):
        s = IndexSearcher(ix, pruned=False)
        td = s.search("merge flush", 1)
        text = str(s.explain("merge flush", int(td.docids[0])))
        assert "sum of:" in text and "weight(" in text


class TestExplainReviewRegressions:
    def test_segment_missing_clause_alignment(self, tmp_path, ray_session):
        # a term present in SOME segments only must not shift leaf labels
        # (per-query clause building — review regression)
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = []
        for i in range(40):
            # 'rareword' exists ONLY in the first 10 docs (first segment)
            text = "merge flush" + (" rareword" if i < 10 else " common")
            rows.append(
                {"repo": "r", "path": f"p{i}", "commit": "c", "lang": "py",
                 "content": text}
            )
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        d = str(tmp_path / "ix")
        build_index([src], d, target_docs=10)  # 4 segments; rareword in seg 0
        s = IndexSearcher(d, pruned=False)
        rare = "rareword"
        q = f"{rare} merge"
        td = s.search(q, 20)
        for d, score in zip(td.docids.tolist(), td.scores.tolist()):
            ex = s.explain(q, d)
            assert ex.value == pytest.approx(score, abs=0.0)
            for leaf in ex.details:
                if "weight(content:" in leaf.description:
                    term = leaf.description.split("content:")[1].split(" ")[0]
                    boost, idf, tf = (x.value for x in leaf.details)
                    assert leaf.value == pytest.approx(boost * idf * tf, rel=1e-5), (
                        term, d,
                    )

    def test_explain_with_classic_similarity(self, ix):
        from lucene_ray.search.similarity import ClassicSimilarity

        s = IndexSearcher(ix, similarity=ClassicSimilarity(), pruned=False)
        td = s.search("merge flush", 5)
        assert len(td.docids)
        for d, score in zip(td.docids.tolist(), td.scores.tolist()):
            ex = s.explain("merge flush", d)
            assert ex.is_match
            assert ex.value == pytest.approx(score, abs=0.0)
            assert all("ClassicSimilarity" in l.description for l in ex.details)
