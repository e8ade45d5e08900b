"""BM25 property tests (BaseSimilarityTestCase.testRandomScoring semantics,
test-framework/.../similarities/BaseSimilarityTestCase.java:258-430) plus
golden float32 values computed from the Java formula by hand."""

import numpy as np
import pytest

from lucene_ray.search.similarity import BM25ExactSimilarity, BM25Similarity
from lucene_ray.util.smallfloat import int_to_byte4


def java_score(freq, norm_byte, df, N, sttf, k1=1.2, b=0.75, boost=1.0):
    """Reference float32 computation, transliterated step by step."""
    from lucene_ray.util.smallfloat import LENGTH_TABLE_F32

    idf = np.float32(np.log(1 + (N - df + 0.5) / (df + 0.5)))
    avgdl = np.float32(sttf / float(N))
    cache = np.float32(1.0) / (
        np.float32(k1)
        * ((np.float32(1) - np.float32(b)) + np.float32(b) * LENGTH_TABLE_F32 / avgdl)
    )
    weight = np.float32(boost) * idf
    inv = cache[norm_byte & 0xFF]
    return weight - weight / (np.float32(1) + np.float32(freq) * inv)


def test_golden_values():
    sim = BM25Similarity()
    sc = sim.scorer(doc_freq=5, doc_count=100, sum_total_term_freq=1000)
    for freq, nb in [(1, 10), (3, 10), (10, 40), (2, 255), (7, 0)]:
        got = sc.score(np.array([freq]), np.array([nb]))[0]
        want = java_score(freq, nb, 5, 100, 1000)
        assert got == want  # bit-identical float32


def test_param_validation():
    # TestBM25Similarity.java:22 parameter checks
    with pytest.raises(ValueError):
        BM25Similarity(k1=-1)
    with pytest.raises(ValueError):
        BM25Similarity(k1=float("nan"))
    with pytest.raises(ValueError):
        BM25Similarity(b=1.5)
    with pytest.raises(ValueError):
        BM25Similarity(b=-0.1)
    BM25Similarity(k1=0.0, b=0.0)
    BM25Similarity(k1=5.0, b=1.0)


def test_random_scoring_properties():
    rng = np.random.default_rng(42)
    for _ in range(200):
        N = int(rng.integers(1, 2**30))
        df = int(rng.integers(1, N + 1))
        sttf = int(rng.integers(N, N * 10 + 1))
        sim = BM25Similarity()
        sc = sim.scorer(df, N, sttf)
        freqs = np.sort(rng.uniform(1, 1e6, size=20).astype(np.float32))
        norms = np.arange(256)
        # finite, >= 0, <= global max bound
        s = sc.score(np.repeat(freqs, 256), np.tile(norms, 20))
        assert np.all(np.isfinite(s))
        assert np.all(s >= 0)
        assert np.all(s <= sc.global_max_score())
        # monotone non-decreasing in freq at fixed norm
        for nb in (0, 1, 128, 255):
            sf_ = sc.score(freqs, np.full(20, nb))
            assert np.all(np.diff(sf_) >= 0)
        # non-increasing in encoded length at fixed freq
        sn = sc.score(np.full(256, freqs[5]), norms)
        assert np.all(np.diff(sn) <= 0)


def test_max_score_is_upper_bound():
    sim = BM25Similarity()
    sc = sim.scorer(doc_freq=10, doc_count=1000, sum_total_term_freq=5000)
    rng = np.random.default_rng(1)
    tfs = rng.integers(1, 100, size=128)
    norms = rng.integers(1, 256, size=128)
    from lucene_ray.codec.postings_codec import pareto_impacts

    packed = pareto_impacts(tfs, norms)
    bound = sc.max_score(packed)
    scores = sc.score(tfs.astype(np.float32), norms)
    assert np.all(scores <= bound)
    assert bound == scores.max()  # pareto front is tight


def test_exact_similarity_matches_quantized_when_lengths_exact():
    """For doc lengths < NUM_FREE_VALUES the byte norm is exact, so the
    float32 engine and the float64 exact engine agree to ~1e-6 relative."""
    ex = BM25ExactSimilarity()
    sim = BM25Similarity()
    N, df, sttf = 100, 7, 1200
    sc = sim.scorer(df, N, sttf)
    lens = np.array([1, 5, 10, 20, 23])
    tfs = np.array([1, 2, 3, 4, 5])
    nb = int_to_byte4(lens)
    got32 = sc.score(tfs.astype(np.float32), nb)
    got64 = ex.score(tfs, lens, df, N, avgdl=sttf / N)
    np.testing.assert_allclose(got32, got64, rtol=2e-6)


def test_exact_sql_parity():
    import duckdb

    ex = BM25ExactSimilarity()
    N, df, avgdl = 500, 13, 37.25
    tfs = np.array([1, 2, 5, 9], dtype=np.float64)
    dls = np.array([10, 50, 37, 120], dtype=np.float64)
    py = ex.score(tfs, dls, df, N, avgdl)
    con = duckdb.connect()
    expr = BM25ExactSimilarity.sql("tf", "dl", str(df), str(N), str(avgdl))
    rows = con.execute(
        f"SELECT {expr} FROM (SELECT unnest($1::DOUBLE[]) tf, unnest($2::DOUBLE[]) dl)",
        [tfs.tolist(), dls.tolist()],
    ).fetchall()
    sql = np.array([r[0] for r in rows])
    assert np.array_equal(py, sql)  # bit-identical doubles


@pytest.fixture(scope="module")
def cix(tmp_path_factory, ray_session):
    import glob

    from lucene_ray.index.builder import build_index
    from lucene_ray.index.corpus import write_corpus

    corpus = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(corpus, n_docs=300, n_shards=2, seed=11, row_group_size=128)
    d = str(tmp_path_factory.mktemp("cix"))
    build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=80)
    return d


class TestClassicSimilarity:
    """ClassicSimilarity (TF-IDF) plugged into the engine: pruned duel +
    naive-oracle rank check (the §2.10 similarity extension point)."""

    def test_classic_duel_pruned_vs_exhaustive(self, cix):
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.similarity import ClassicSimilarity

        ex = IndexSearcher(cix, similarity=ClassicSimilarity(), pruned=False)
        pr = IndexSearcher(cix, similarity=ClassicSimilarity(), pruned=True)
        for q in ("merge", "merge flush", "sort batch index", "+merge flush"):
            a, b = ex.search(q, 10), pr.search(q, 10)
            assert a.docids.tolist() == b.docids.tolist(), q
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)

    def test_classic_ranks_match_naive_oracle(self, cix):
        import glob as _g

        import pyarrow.parquet as pq

        from lucene_ray.analysis import get_analyzer
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.reader import IndexReader
        from lucene_ray.search.similarity import ClassicSimilarity
        from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

        s = IndexSearcher(cix, similarity=ClassicSimilarity(), pruned=False)
        an = get_analyzer(s.reader.manifest.analyzer)
        docs = []
        for e in s.reader.segments:
            t = pq.ParquetFile(e.input["file"]).read_row_groups(
                list(range(e.input["rg_start"], e.input["rg_end"])),
                columns=["content"],
            )
            docs.extend(an.tokenize_text(x) for x in t.column("content").to_pylist())
        N = len(docs)
        for qtext in ("merge", "merge flush"):
            terms = an.tokenize_text(qtext)
            scores = np.zeros(N, dtype=np.float32)
            for t in terms:
                df = sum(1 for d in docs if t in d)
                if df == 0:
                    continue
                idf = np.float32(1.0 + np.log((N + 1) / (df + 1)))
                for i, d in enumerate(docs):
                    tf = d.count(t)
                    if tf == 0:
                        continue
                    # quantized dl, as the engine reads it from the norm byte
                    dl = float(byte4_to_int(int(int_to_byte4(len(d)))))
                    scores[i] += np.float32(
                        idf * np.float32(np.sqrt(np.float32(tf)))
                        * np.float32(1.0 / np.sqrt(np.float32(max(dl, 1.0))))
                    )
            want = [
                i for i in np.lexsort((np.arange(N), -scores))[:10] if scores[i] > 0
            ]
            got = s.search(qtext, 10).docids.tolist()
            assert got == want, qtext


class TestSimilarityFamilies:
    """LMDirichlet / DFR(InL2) / Boolean similarities: BaseSimilarityTestCase
    random-scoring properties, pruned duel through the engine, naive float32
    oracle rank check, and exact-twin/DuckDB bit parity."""

    def test_param_validation(self):
        from lucene_ray.search.similarity import (
            DFRSimilarity,
            IBSimilarity,
            LMDirichletSimilarity,
        )

        with pytest.raises(ValueError):
            LMDirichletSimilarity(mu=0)
        with pytest.raises(ValueError):
            LMDirichletSimilarity(mu=float("nan"))
        with pytest.raises(ValueError):
            DFRSimilarity(c=0)
        with pytest.raises(ValueError):
            IBSimilarity(c=-1)
        from lucene_ray.search.similarity import (
            AxiomaticF2EXP,
            LMJelinekMercerSimilarity,
        )

        with pytest.raises(ValueError):
            LMJelinekMercerSimilarity(lam=0.0)
        with pytest.raises(ValueError):
            LMJelinekMercerSimilarity(lam=1.0)
        with pytest.raises(ValueError):
            AxiomaticF2EXP(k=0)
        with pytest.raises(ValueError):
            AxiomaticF2EXP(s=-1)
        LMDirichletSimilarity(mu=500.0)
        DFRSimilarity(c=7.0)
        IBSimilarity(c=2.0)
        LMJelinekMercerSimilarity(lam=0.7)
        AxiomaticF2EXP(k=0.2, s=1.0)

    @pytest.mark.parametrize("family", ["lmd", "dfr", "dfi", "ib", "lmjm", "ax"])
    def test_random_scoring_properties(self, family):
        from lucene_ray.search.similarity import (
            AxiomaticF2EXP,
            DFISimilarity,
            DFRSimilarity,
            IBSimilarity,
            LMDirichletSimilarity,
            LMJelinekMercerSimilarity,
        )

        rng = np.random.default_rng(7)
        for _ in range(100):
            N = int(rng.integers(1, 2**30))
            df = int(rng.integers(1, N + 1))
            sttf = int(rng.integers(N, N * 10 + 1))
            ttf = int(rng.integers(df, min(sttf, df * 50) + 1))
            sim = {
                "lmd": LMDirichletSimilarity,
                "dfr": DFRSimilarity,
                "dfi": DFISimilarity,
                "ib": IBSimilarity,
                "lmjm": LMJelinekMercerSimilarity,
                "ax": AxiomaticF2EXP,
            }[family]()
            sc = sim.scorer(df, N, sttf, total_term_freq=ttf)
            freqs = np.sort(rng.uniform(1, 1e6, size=20).astype(np.float32))
            norms = np.arange(256)
            s = sc.score(np.repeat(freqs, 256), np.tile(norms, 20))
            assert np.all(np.isfinite(s))
            assert np.all(s >= 0)
            assert np.all(s <= sc.global_max_score())
            for nb in (0, 1, 128, 255):
                sf_ = sc.score(freqs, np.full(20, nb))
                assert np.all(np.diff(sf_) >= -1e-6)
            # norm byte 0 = empty doc: a term cannot occur there, and DFI
            # defines the measure only for expected > 0 (scores 0) — start
            # the length-monotonicity sweep at the first real length
            lo = 1 if family == "dfi" else 0
            sn = sc.score(np.full(256 - lo, freqs[5]), norms[lo:])
            assert np.all(np.diff(sn) <= 1e-6)

    @pytest.mark.parametrize(
        "family", ["lmd", "dfr", "dfi", "ib", "lmjm", "ax", "sweet"]
    )
    def test_block_max_is_upper_bound(self, family):
        from lucene_ray.search.similarity import (
            AxiomaticF2EXP,
            DFISimilarity,
            DFRSimilarity,
            IBSimilarity,
            LMDirichletSimilarity,
            LMJelinekMercerSimilarity,
        )

        sim = {
            "lmd": LMDirichletSimilarity,
            "dfr": DFRSimilarity,
            "dfi": DFISimilarity,
            "ib": IBSimilarity,
            "lmjm": LMJelinekMercerSimilarity,
            "ax": AxiomaticF2EXP,
            "sweet": lambda: __import__(
                "lucene_ray.search.similarity", fromlist=["SweetSpotSimilarity"]
            ).SweetSpotSimilarity(40, 120, 0.5, 1.5, 5.0),
        }[family]()
        sc = sim.scorer(10, 1000, 5000, total_term_freq=50)
        rng = np.random.default_rng(3)
        tfs = rng.integers(1, 100, size=256).astype(np.int64)
        norms = rng.integers(1, 256, size=256).astype(np.int64)
        offsets = np.array([0, 64, 128, 192])
        bounds = sc.max_score_blocks(tfs, norms, offsets)
        scores = sc.score(tfs.astype(np.float32), norms)
        for bi, (lo, hi) in enumerate(zip(offsets, [64, 128, 192, 256])):
            assert np.all(scores[lo:hi] <= bounds[bi] + 1e-7)

    @pytest.mark.parametrize(
        "family", ["lmd", "dfr", "dfi", "ib", "lmjm", "ax", "bool", "sweet"]
    )
    def test_duel_pruned_vs_exhaustive(self, cix, family):
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.similarity import (
            AxiomaticF2EXP,
            BooleanSimilarity,
            DFISimilarity,
            DFRSimilarity,
            IBSimilarity,
            LMDirichletSimilarity,
            LMJelinekMercerSimilarity,
        )

        sim = {
            "lmd": LMDirichletSimilarity,
            "dfr": DFRSimilarity,
            "dfi": DFISimilarity,
            "ib": IBSimilarity,
            "lmjm": LMJelinekMercerSimilarity,
            "ax": AxiomaticF2EXP,
            "bool": BooleanSimilarity,
            "sweet": lambda: __import__(
                "lucene_ray.search.similarity", fromlist=["SweetSpotSimilarity"]
            ).SweetSpotSimilarity(40, 120, 0.5, 1.5, 5.0),
        }[family]()
        ex = IndexSearcher(cix, similarity=sim, pruned=False)
        pr = IndexSearcher(cix, similarity=sim, pruned=True)
        for q in ("merge", "merge flush", "sort batch index", "+merge flush"):
            a, b = ex.search(q, 10), pr.search(q, 10)
            assert a.docids.tolist() == b.docids.tolist(), (family, q)
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)

    def test_lmd_ranks_match_naive_oracle(self, cix):
        import math

        import pyarrow.parquet as pq

        from lucene_ray.analysis import get_analyzer
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.similarity import LMDirichletSimilarity
        from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

        s = IndexSearcher(cix, similarity=LMDirichletSimilarity(), pruned=True)
        an = get_analyzer(s.reader.manifest.analyzer)
        docs = []
        for e in s.reader.segments:
            t = pq.ParquetFile(e.input["file"]).read_row_groups(
                list(range(e.input["rg_start"], e.input["rg_end"])),
                columns=["content"],
            )
            docs.extend(an.tokenize_text(x) for x in t.column("content").to_pylist())
        N = len(docs)
        sum_ttf = s.reader.sum_ttf
        mu = 2000.0
        for qtext in ("merge", "merge flush"):
            terms = an.tokenize_text(qtext)
            scores = np.zeros(N, dtype=np.float64)
            for t in terms:
                ttf = sum(d.count(t) for d in docs)
                if ttf == 0:
                    continue
                p = (ttf + 1.0) / (sum_ttf + 1.0)
                for i, d in enumerate(docs):
                    tf = d.count(t)
                    if tf == 0:
                        continue
                    dl = float(byte4_to_int(int(int_to_byte4(len(d)))))
                    scores[i] += max(
                        0.0, math.log1p(tf / (mu * p)) + math.log(mu / (dl + mu))
                    )
            want = [
                i for i in np.lexsort((np.arange(N), -scores))[:10] if scores[i] > 0
            ]
            got = s.search(qtext, 10).docids.tolist()
            assert got == want, qtext

    def test_boolean_similarity_scores_are_boost(self, cix):
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.similarity import BooleanSimilarity

        s = IndexSearcher(cix, similarity=BooleanSimilarity())
        td = s.search("merge", 10)
        assert len(td.docids) > 0
        assert np.all(td.scores == np.float32(1.0))
        # boost-only ties -> docid order
        assert td.docids.tolist() == sorted(td.docids.tolist())

    @pytest.mark.parametrize(
        "family", ["lmd", "dfr", "dfi", "ib", "lmjm", "ax", "sweet"]
    )
    def test_exact_sql_parity(self, family):
        import duckdb

        from lucene_ray.search.similarity import (
            AxiomaticF2EXPExactSimilarity,
            DFIExactSimilarity,
            DFRExactSimilarity,
            IBExactSimilarity,
            LMDirichletExactSimilarity,
            LMJelinekMercerExactSimilarity,
        )

        from lucene_ray.search.similarity import SweetSpotExactSimilarity

        ex = {
            "lmd": LMDirichletExactSimilarity,
            "dfr": DFRExactSimilarity,
            "dfi": DFIExactSimilarity,
            "ib": IBExactSimilarity,
            "lmjm": LMJelinekMercerExactSimilarity,
            "ax": AxiomaticF2EXPExactSimilarity,
            "sweet": SweetSpotExactSimilarity,
        }[family]()
        N, df, avgdl, ttf, sum_len = 500, 13, 37.25, 91, 18625
        tfs = np.array([1, 2, 5, 9], dtype=np.float64)
        dls = np.array([10, 50, 37, 120], dtype=np.float64)
        py = ex.score(tfs, dls, df, N, avgdl, ttf=ttf, sum_len=sum_len)
        con = duckdb.connect()
        expr = ex.sql(
            "tf", "dl", str(df), str(N), str(avgdl),
            ttf=str(ttf), sum_len=str(sum_len),
        )
        rows = con.execute(
            f"SELECT {expr} FROM (SELECT unnest($1::DOUBLE[]) tf, unnest($2::DOUBLE[]) dl)",
            [tfs.tolist(), dls.tolist()],
        ).fetchall()
        sql = np.array([r[0] for r in rows])
        assert np.array_equal(py, sql)  # bit-identical doubles


class TestSweetSpot:
    """misc/SweetSpotSimilarity.java spec points (javadoc curve anchors)."""

    def test_plateau_length_norm(self):
        from lucene_ray.search.similarity import SweetSpotSimilarity

        sim = SweetSpotSimilarity(40, 120, 0.5)
        cache = sim._norm_cache()
        # plateau: any decoded length inside [40, 120] gets norm 1.0
        import numpy as np

        from lucene_ray.search.similarity import LENGTH_TABLE_F32

        dl = np.maximum(LENGTH_TABLE_F32, 1.0)
        inside = (dl >= 40) & (dl <= 120)
        assert np.allclose(cache[inside], 1.0)
        assert np.all(cache[~inside] < 1.0)
        # spec formula at a point outside: dl=140 -> 1/sqrt(0.5*20+1)
        b = int(np.argmin(np.abs(dl - 140)))
        import math

        expect = 1.0 / math.sqrt(0.5 * (abs(dl[b] - 40) + abs(dl[b] - 120) - 80) + 1.0)
        assert abs(float(cache[b]) - expect) < 1e-6

    def test_baseline_tf(self):
        import numpy as np

        from lucene_ray.search.similarity import SweetSpotSimilarity

        sim = SweetSpotSimilarity(1, 1, 0.5, tf_base=1.5, tf_min=5.0)
        sc = sim.scorer(10, 1000, 5000)
        # freq 0 -> 0; freq <= 5 -> base; above -> sqrt(f + base^2 - min)
        tf = sc._tf(np.array([0.0, 1.0, 5.0, 9.0], dtype=np.float32))
        assert tf[0] == 0.0
        assert tf[1] == tf[2] == np.float32(1.5)
        assert abs(float(tf[3]) - (9.0 + 2.25 - 5.0) ** 0.5) < 1e-6

    def test_hyperbolic_tf(self):
        from lucene_ray.search.similarity import SweetSpotSimilarity

        sim = SweetSpotSimilarity()
        # at freq == xoffset the curve crosses the midpoint (min+max)/2
        assert abs(sim.hyperbolic_tf(10.0) - 1.0) < 1e-9
        # saturates at max for large freq, 0 stays 0
        assert abs(sim.hyperbolic_tf(1e6) - 2.0) < 1e-9 or sim.hyperbolic_tf(1e6) == 2.0
        assert sim.hyperbolic_tf(0.0) == 0.0
