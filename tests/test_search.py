"""Search correctness: the pruned-vs-exhaustive duel (CheckHits.checkTopScores
semantics, test-framework/.../search/CheckHits.java:691-712 — same docids in
same order, scores within 1e-6), boolean/phrase semantics vs a naive Python
oracle, tie-breaks, and the Ray query stage."""

import glob

import numpy as np
import pytest

from lucene_ray.analysis import get_analyzer
from lucene_ray.index.builder import build_index
from lucene_ray.index.corpus import write_corpus
from lucene_ray.search.engine import IndexSearcher, search_queries_dataset
from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery, parse_query


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, ray_session):
    corpus = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(corpus, n_docs=800, n_shards=2, seed=7, row_group_size=64)
    d = str(tmp_path_factory.mktemp("index"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=150)
    return d


@pytest.fixture(scope="module")
def corpus_tokens(index_dir):
    """Naive oracle corpus: per-doc token lists in global docid order."""
    import pyarrow.parquet as pq

    from lucene_ray.search.reader import IndexReader

    an = get_analyzer("code")
    reader = IndexReader(index_dir)
    docs = []
    for e in reader.segments:
        pf = pq.ParquetFile(e.input["file"])
        t = pf.read_row_groups(
            list(range(e.input["rg_start"], e.input["rg_end"])), columns=["content"]
        )
        for txt in t.column("content").to_pylist():
            docs.append(an.tokenize_text(txt))
    return docs


QUERY_SET = [
    "getmanager",            # single hot term
    "merge",                 # keyword
    "get merge flush index", # disjunction
    "parse AND block",       # conjunction
    "+index -merge token",   # mixed
    "zzzznotfound",          # empty result
    "read 500",              # digit term
    '"get manager"',         # phrase (split camelCase at index time)
    "get OR set OR read OR write OR parse OR build",  # wide OR
]


@pytest.mark.parametrize("k", [1, 10, 100])
@pytest.mark.parametrize("q", QUERY_SET)
def test_duel_pruned_vs_exhaustive(index_dir, q, k):
    ex = IndexSearcher(index_dir, pruned=False)
    pr = IndexSearcher(index_dir, pruned=True)
    a = ex.search(q, k)
    b = pr.search(q, k)
    assert a.docids.tolist() == b.docids.tolist(), q
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6, atol=0)


def test_topk_matches_naive_oracle(index_dir, corpus_tokens):
    """Exhaustive engine vs a from-first-principles BM25 over token lists."""
    import math

    from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

    docs = corpus_tokens
    N = len(docs)
    sttf = sum(len(d) for d in docs)
    terms = ["merge", "flush"]
    dfs = {t: sum(1 for d in docs if t in d) for t in terms}
    avgdl = np.float32(sttf / N)
    scores = np.zeros(N, dtype=np.float32)
    for t in terms:
        idf = np.float32(math.log(1 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5)))
        for i, d in enumerate(docs):
            tf = d.count(t)
            if tf == 0:
                continue
            norm_len = np.float32(byte4_to_int(int_to_byte4(np.array([len(d)])))[0])
            inv = np.float32(1.0) / (
                np.float32(1.2) * (np.float32(0.25) + np.float32(0.75) * norm_len / avgdl)
            )
            scores[i] += idf - idf / (np.float32(1.0) + np.float32(tf) * inv)
    order = np.lexsort((np.arange(N), -scores.astype(np.float64)))
    expect = [(int(i), float(scores[i])) for i in order[:10] if scores[i] > 0]

    got = IndexSearcher(index_dir, pruned=False).search("merge flush", 10)
    assert got.docids.tolist() == [d for d, _ in expect]
    np.testing.assert_allclose(
        got.scores, np.array([s for _, s in expect], dtype=np.float32), rtol=1e-6
    )


def test_boolean_semantics(index_dir, corpus_tokens):
    docs = corpus_tokens
    s = IndexSearcher(index_dir, pruned=True)

    td = s.search("parse AND block", 10_000)
    expect = {i for i, d in enumerate(docs) if "parse" in d and "block" in d}
    assert set(td.docids.tolist()) == expect

    td = s.search("+index -merge", 10_000)
    expect = {i for i, d in enumerate(docs) if "index" in d and "merge" not in d}
    assert set(td.docids.tolist()) == expect

    bq = BooleanQuery(should=[TermQuery("parse"), TermQuery("block"), TermQuery("flush")],
                      min_should_match=2)
    td = s.search(bq, 10_000)
    expect = {
        i
        for i, d in enumerate(docs)
        if sum(t in d for t in ("parse", "block", "flush")) >= 2
    }
    assert set(td.docids.tolist()) == expect


def test_phrase_semantics(index_dir, corpus_tokens):
    docs = corpus_tokens
    s = IndexSearcher(index_dir, pruned=False)
    bq = BooleanQuery(should=[PhraseQuery(("get", "manager"))])
    td = s.search(bq, 10_000)

    def phrase_count(d):
        return sum(
            1
            for i in range(len(d) - 1)
            if d[i] == "get" and d[i + 1] == "manager"
        )

    expect = {i for i, d in enumerate(docs) if phrase_count(d) > 0}
    assert set(td.docids.tolist()) == expect


def test_empty_and_absent(index_dir):
    s = IndexSearcher(index_dir)
    assert s.search("zzzznotfound", 10).docids.tolist() == []
    assert s.search("", 10).docids.tolist() == []
    assert s.search('"zzz yyy"', 10).docids.tolist() == []


def test_tie_break_docid_asc(index_dir):
    s = IndexSearcher(index_dir, pruned=True)
    td = s.search("getmanager", 200)
    pairs = list(zip(td.scores.tolist(), td.docids.tolist()))
    for (s1, d1), (s2, d2) in zip(pairs, pairs[1:]):
        assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_parser():
    an = get_analyzer("code")
    bq = parse_query('+fooBar -baz "hello world" rest', an)
    assert [q.term for q in bq.must] == ["foo", "bar"]
    assert [q.term for q in bq.must_not] == ["baz"]
    assert any(isinstance(q, PhraseQuery) and q.terms == ("hello", "world") for q in bq.should)
    assert any(isinstance(q, TermQuery) and q.term == "rest" for q in bq.should)
    bq2 = parse_query("a AND b", an)
    assert [q.term for q in bq2.must] == ["a", "b"]


def test_query_stage_dataset(index_dir, ray_session):
    import ray.data

    qds = ray.data.from_items(
        [
            {"qid": 0, "query": "merge"},
            {"qid": 1, "query": "get flush"},
            {"qid": 2, "query": "zzzznotfound"},
        ]
    )
    out = search_queries_dataset(qds, index_dir, k=5, concurrency=2).to_pandas()
    s = IndexSearcher(index_dir, pruned=True)
    for qid, qtext in [(0, "merge"), (1, "get flush")]:
        got = out[out.qid == qid].sort_values("rank")
        want = s.search(qtext, 5)
        assert got.docid.tolist() == want.docids.tolist()
    assert len(out[out.qid == 2]) == 0


class TestLRUQueryCache:
    """search/LRUQueryCache.java semantics: compound clauses cached from
    the second use; term queries never cached; per-reader invalidation."""

    def test_phrase_cached_on_second_use(self, index_dir):
        s = IndexSearcher(index_dir)
        q = '"sort merge"'
        r1 = s.search(q, 10)
        r2 = s.search(q, 10)
        r3 = s.search(q, 10)
        assert r1.docids.tolist() == r2.docids.tolist() == r3.docids.tolist()
        caches = [
            s.reader.segment_reader(e.name).query_cache
            for e in s.reader.segments
        ]
        assert sum(c.hit_count for c in caches) > 0
        # 1st use = tracked miss, 2nd = caching miss, 3rd+ = hits
        assert all(c.miss_count <= 2 * max(1, len(c._counts)) for c in caches)

    def test_term_queries_not_cached(self, index_dir):
        s = IndexSearcher(index_dir)
        for _ in range(3):
            s.search("merge", 10)
        caches = [
            s.reader.segment_reader(e.name).query_cache
            for e in s.reader.segments
        ]
        assert all(len(c._data) == 0 for c in caches)

    def test_results_identical_with_cache(self, index_dir):
        import numpy as np

        s = IndexSearcher(index_dir)
        queries = ['"sort merge" flush', "merge batch"]
        first = [s.search(q, 20) for q in queries]
        again = [s.search(q, 20) for q in queries]
        for a, b in zip(first, again):
            assert a.docids.tolist() == b.docids.tolist()
            np.testing.assert_array_equal(a.scores, b.scores)

    def test_eviction_bound(self, index_dir):
        from lucene_ray.search.reader import LRUQueryCache

        c = LRUQueryCache(max_entries=2, min_frequency=1)
        for i in range(5):
            c.get_or_compute(("k", i), lambda i=i: i)
        assert len(c._data) <= 2
        # most recent survive
        assert ("k", 4) in c._data


class TestRandomQueryTreeDuel:
    """Randomized one-level boolean trees over every scoreable query type:
    pruned == exhaustive (docids AND scores), and doc sets match a naive
    Python oracle. The fuzz analog of CheckHits.checkTopScores across the
    full §2.11 surface."""

    TERMS = ["merge", "flush", "sort", "batch", "index", "window",
             "parse", "block", "token", "zzzmissing"]

    def _rand_leaf(self, rng):
        from lucene_ray.search.query import (
            DisjunctionMaxQuery,
            DisjunctionSumQuery,
            MultiPhraseQuery,
            NestedBooleanQuery,
            PhraseQuery,
            SpanNearQuery,
            SynonymQuery,
            TermQuery,
        )

        kind = rng.randrange(8)
        t = lambda: rng.choice(self.TERMS)
        if kind == 0:
            return TermQuery(t(), boost=rng.choice([1.0, 2.0]))
        if kind == 1:
            return PhraseQuery((t(), t()), slop=rng.choice([0, 2]))
        if kind == 2:
            a, b = rng.sample(self.TERMS, 2)
            return SynonymQuery((a, b))
        if kind == 3:
            return DisjunctionMaxQuery((TermQuery(t()), TermQuery(t())), 0.3)
        if kind == 4:
            return DisjunctionSumQuery((TermQuery(t()), TermQuery(t())))
        if kind == 5:
            a, b = rng.sample(self.TERMS, 2)
            return SpanNearQuery((a, b), slop=2, ordered=bool(rng.getrandbits(1)))
        if kind == 6:
            return MultiPhraseQuery(((t(), t()), (t(),)))
        return NestedBooleanQuery(
            must=(TermQuery(t()),), should=(TermQuery(t()),)
        )

    def _oracle_match(self, toks, q):
        from lucene_ray.search.query import (
            DisjunctionMaxQuery,
            DisjunctionSumQuery,
            MultiPhraseQuery,
            NestedBooleanQuery,
            PhraseQuery,
            SpanNearQuery,
            SynonymQuery,
            TermQuery,
        )

        if isinstance(q, TermQuery):
            return q.term in toks
        if isinstance(q, SynonymQuery):
            return any(t in toks for t in q.terms)
        if isinstance(q, (DisjunctionMaxQuery, DisjunctionSumQuery)):
            return any(self._oracle_match(toks, d) for d in q.disjuncts)
        if isinstance(q, PhraseQuery):
            if q.slop == 0:
                return any(
                    toks[i : i + len(q.terms)] == list(q.terms)
                    for i in range(len(toks) - len(q.terms) + 1)
                )
            # sloppy: adjusted-position span <= slop over one pick per term
            import itertools

            pos = [[p for p, x in enumerate(toks) if x == term] for term in q.terms]
            if any(not p for p in pos):
                return False
            for pick in itertools.product(*pos):
                if len(set(pick)) < len(pick):
                    continue
                adj = [p - i for i, p in enumerate(pick)]
                if max(adj) - min(adj) <= q.slop:
                    return True
            return False
        if isinstance(q, SpanNearQuery):
            import itertools

            pos = [[p for p, x in enumerate(toks) if x == term] for term in q.terms]
            if any(not p for p in pos):
                return False
            for pick in itertools.product(*pos):
                if q.ordered:
                    if all(pick[i] < pick[i + 1] for i in range(len(pick) - 1)) and (
                        pick[-1] - pick[0] - (len(pick) - 1) <= q.slop
                    ):
                        return True
                else:
                    if len(set(pick)) == len(pick) and (
                        max(pick) - min(pick) + 1 - len(pick) <= q.slop
                    ):
                        return True
            return False
        if isinstance(q, MultiPhraseQuery):
            for start in range(len(toks) - len(q.slots) + 1):
                if all(toks[start + i] in q.slots[i] for i in range(len(q.slots))):
                    return True
            return False
        if isinstance(q, NestedBooleanQuery):
            return self._oracle_bq(toks, q.to_boolean())
        raise AssertionError(type(q))

    def _oracle_bq(self, toks, bq):
        if bq.must and not all(self._oracle_match(toks, q) for q in bq.must):
            return False
        if any(self._oracle_match(toks, q) for q in bq.must_not):
            return False
        n_should = sum(self._oracle_match(toks, q) for q in bq.should)
        msm = bq.min_should_match if bq.must else max(1, bq.min_should_match)
        if bq.should and n_should < msm:
            return False
        if not bq.must and not bq.should:
            return False
        return True

    def test_random_trees_duel_and_oracle(self, index_dir, corpus_tokens):
        import random

        from lucene_ray.search.query import BooleanQuery

        rng = random.Random(20260817)
        ex = IndexSearcher(index_dir, pruned=False)
        pr = IndexSearcher(index_dir, pruned=True)
        for trial in range(60):
            bq = BooleanQuery()
            for _ in range(rng.randint(1, 3)):
                bq.should.append(self._rand_leaf(rng))
            if rng.random() < 0.4:
                bq.must.append(self._rand_leaf(rng))
            if rng.random() < 0.3:
                bq.must_not.append(self._rand_leaf(rng))
            if rng.random() < 0.2 and len(bq.should) >= 2:
                bq.min_should_match = 2
            try:
                a = ex.search(bq, 10_000_000)
            except ValueError:
                continue  # e.g. repeated span terms — documented rejection
            b = pr.search(bq, 10)
            assert a.docids[:10].tolist() == b.docids.tolist(), (trial, bq)
            np.testing.assert_allclose(
                a.scores[:10], b.scores, rtol=1e-6, err_msg=str((trial, bq))
            )
            got = set(a.docids.tolist())
            want = {
                i for i, toks in enumerate(corpus_tokens)
                if self._oracle_bq(toks, bq)
            }
            assert got == want, (trial, bq)


class TestRandomTreeDuelWithDeletes:
    """The same randomized-tree contract on an index with tombstones:
    duel + oracle doc sets + exact counts + TotalHits relation honesty."""

    _h = TestRandomQueryTreeDuel()

    def _rand_leaf(self, rng):
        return self._h._rand_leaf(rng)

    def _oracle_bq(self, toks, bq):
        return self._h._oracle_bq(toks, bq)

    @pytest.fixture(scope="class")
    def del_ix(self, tmp_path_factory, ray_session):
        import glob as _g

        from lucene_ray.index.writer import delete_docs

        corpus = str(tmp_path_factory.mktemp("delcorpus"))
        write_corpus(corpus, n_docs=500, n_shards=2, seed=31, row_group_size=100)
        d = str(tmp_path_factory.mktemp("delix"))
        build_index(sorted(_g.glob(corpus + "/*.parquet")), d, target_docs=100)
        delete_docs(d, list(range(0, 500, 11)))
        return d

    def test_random_trees_with_deletes(self, del_ix):
        import random

        import pyarrow.parquet as pq

        from lucene_ray.search.query import BooleanQuery
        from lucene_ray.search.reader import IndexReader

        ex = IndexSearcher(del_ix, pruned=False)
        pr = IndexSearcher(del_ix, pruned=True)
        an = get_analyzer(ex.reader.manifest.analyzer)
        docs = []
        for e in IndexReader(del_ix).segments:
            t = pq.ParquetFile(e.input["file"]).read_row_groups(
                list(range(e.input["rg_start"], e.input["rg_end"])),
                columns=["content"],
            )
            docs.extend(an.tokenize_text(x) for x in t.column("content").to_pylist())
        deleted = set(range(0, 500, 11))
        rng = random.Random(4242)
        for trial in range(40):
            bq = BooleanQuery()
            for _ in range(rng.randint(1, 3)):
                bq.should.append(self._rand_leaf(rng))
            if rng.random() < 0.4:
                bq.must.append(self._rand_leaf(rng))
            if rng.random() < 0.3:
                bq.must_not.append(self._rand_leaf(rng))
            try:
                a = ex.search(bq, 10_000_000)
            except ValueError:
                continue
            b = pr.search(bq, 10)
            assert a.docids[:10].tolist() == b.docids.tolist(), (trial, bq)
            np.testing.assert_allclose(a.scores[:10], b.scores, rtol=1e-6)
            want = {
                i for i, toks in enumerate(docs)
                if self._oracle_bq(toks, bq) and i not in deleted
            }
            assert set(a.docids.tolist()) == want, (trial, bq)
            assert ex.count(bq) == len(want), (trial, bq)
            if b.relation == "eq":
                assert b.total_hits == a.total_hits, (trial, bq)
            else:
                assert b.total_hits <= a.total_hits, (trial, bq)
