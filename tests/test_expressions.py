"""Compiled expression scoring (expressions/.../Expression.java +
queries/.../function/FunctionScoreQuery.java:44): parser/eval unit tests,
plus a FunctionScoreQuery engine duel against a hand-computed oracle."""

import math

import numpy as np
import pytest

from lucene_ray.search.expressions import (
    CompiledExpression,
    ExpressionError,
    compile_expression,
)


class TestCompile:
    def test_precedence_and_parens(self):
        e = compile_expression("1 + 2 * 3 - 4 / 2")
        assert e.evaluate({}) == 5.0
        assert compile_expression("(1 + 2) * 3").evaluate({}) == 9.0

    def test_unary_minus(self):
        assert compile_expression("-3 + 5").evaluate({}) == 2.0
        assert compile_expression("2 * -3").evaluate({}) == -6.0
        assert compile_expression("--4").evaluate({}) == 4.0

    def test_variables_vectorized(self):
        e = compile_expression("2*log(1 + x) + sqrt(y)")
        assert e.variables == {"x", "y"}
        x = np.array([0.0, 1.0, 9.0])
        y = np.array([4.0, 9.0, 16.0])
        got = e.evaluate({"x": x, "y": y})
        np.testing.assert_allclose(got, 2 * np.log1p(x) + np.sqrt(y))

    def test_two_arg_functions(self):
        e = compile_expression("max(a, 3) * 2 + min(a, 1) + pow(a, 2)")
        a = np.array([0.0, 2.0, 5.0])
        np.testing.assert_allclose(
            e.evaluate({"a": a}),
            np.maximum(a, 3) * 2 + np.minimum(a, 1) + a**2,
        )

    def test_scientific_literals(self):
        assert compile_expression("1e3 + 2.5e-1").evaluate({}) == 1000.25

    def test_errors(self):
        for bad in ("1 +", "foo(1)", "min(1)", "log(1, 2)", "a b", "(1", "@", ""):
            with pytest.raises(ExpressionError):
                CompiledExpression(bad)
        with pytest.raises(ExpressionError):
            compile_expression("missing_var + 1").evaluate({})

    def test_memoized(self):
        assert compile_expression("a + 1") is compile_expression("a + 1")


class TestFunctionScoreQuery:
    @pytest.fixture(scope="class")
    def ix(self, tmp_path_factory, ray_session):
        import glob

        from lucene_ray.index.builder import build_index
        from lucene_ray.index.corpus import write_corpus

        corpus = str(tmp_path_factory.mktemp("corpus"))
        write_corpus(corpus, n_docs=300, n_shards=1, seed=11, row_group_size=64)
        d = str(tmp_path_factory.mktemp("ix"))
        build_index(sorted(glob.glob(corpus + "/*.parquet")), d, target_docs=100)
        return d

    def test_rescore_matches_hand_oracle(self, ix):
        """score = 2*_score + log(1+n_chars) + doc_len/100, checked
        doc-by-doc against a plain search + doc-values recomputation."""
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.query import (
            BooleanQuery,
            FunctionScoreQuery,
            TermQuery,
        )

        s = IndexSearcher(ix)
        term = max(
            ("def", "import", "return", "self", "data"),
            key=lambda t: s.reader.global_term_stats([t])[t][0],
        )
        base = s.search(BooleanQuery(should=[TermQuery(term)]), 10_000)
        assert len(base.docids) > 5
        fq = FunctionScoreQuery(
            TermQuery(term), "2*_score + log(1 + n_chars) + doc_len/100", boost=1.5
        )
        got = s.search(BooleanQuery(should=[fq]), 10_000)
        assert set(got.docids.tolist()) == set(base.docids.tolist())
        srs = [
            s.reader.segment_reader(e.name)
            for e in sorted(s.reader.segments, key=lambda e: e.docid_base)
        ]
        n_chars = np.concatenate([sr.doc_values("n_chars") for sr in srs])
        doc_len = np.concatenate([sr.doc_len for sr in srs])
        by_doc = dict(zip(got.docids.tolist(), got.scores.tolist()))
        for d, sc in zip(base.docids.tolist(), base.scores.tolist()):
            want = 1.5 * (
                2 * np.float64(sc)
                + math.log(1 + float(n_chars[d]))
                + float(doc_len[d]) / 100
            )
            assert by_doc[d] == pytest.approx(want, rel=1e-5)

    def test_constant_formula_and_cache(self, ix):
        from lucene_ray.search.engine import IndexSearcher
        from lucene_ray.search.query import (
            BooleanQuery,
            FunctionScoreQuery,
            TermQuery,
        )

        s = IndexSearcher(ix)
        fq = FunctionScoreQuery(TermQuery("def"), "7", boost=2.0)
        td = s.search(BooleanQuery(should=[fq]), 50)
        assert len(td.docids) > 0
        assert np.allclose(td.scores, 14.0)
        # repeat: compound-clause cache path returns identical results
        td2 = s.search(BooleanQuery(should=[fq]), 50)
        np.testing.assert_array_equal(td.docids, td2.docids)


def test_exprscore_gate_matches_duckdb(ray_session):
    """Driver-gate parity at sf0.001 (the driver itself runs sf0.01)."""
    import duckdb

    from lucene_ray.ops.bm25docs import exprscore_engine, exprscore_engine_sql

    sf = "/root/testdata/sf0.001"
    got = exprscore_engine(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(exprscore_engine_sql()).fetchdf()
    got = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    want = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert got.shape == want.shape
    assert (got["docid"].to_numpy() == want["docid"].to_numpy()).all()


class TestFullGrammar:
    """Round-4 grammar completion (js/JavascriptCompiler.java Javascript.g):
    ternary, boolean/comparison ops, modulo, bitwise/shift on long casts,
    and the full trig/log built-in set."""

    def _ev(self, src, **binds):
        import numpy as np

        from lucene_ray.search.expressions import compile_expression

        out = compile_expression(src).evaluate(
            {k: np.asarray(v, dtype=np.float64) for k, v in binds.items()}
        )
        return np.asarray(out, dtype=np.float64)

    def test_comparisons_produce_01(self):
        import numpy as np

        x = [1.0, 5.0, 9.0]
        np.testing.assert_array_equal(self._ev("x > 5", x=x), [0, 0, 1])
        np.testing.assert_array_equal(self._ev("x >= 5", x=x), [0, 1, 1])
        np.testing.assert_array_equal(self._ev("x == 5", x=x), [0, 1, 0])
        np.testing.assert_array_equal(self._ev("x != 5", x=x), [1, 0, 1])

    def test_boolean_and_not(self):
        import numpy as np

        x = [0.0, 3.0, 8.0]
        np.testing.assert_array_equal(
            self._ev("x > 1 && x < 5", x=x), [0, 1, 0]
        )
        np.testing.assert_array_equal(
            self._ev("x == 0 || x > 5", x=x), [1, 0, 1]
        )
        np.testing.assert_array_equal(self._ev("!x", x=x), [1, 0, 0])

    def test_ternary_precedence_and_nesting(self):
        import numpy as np

        x = [1.0, 10.0, 100.0]
        np.testing.assert_array_equal(
            self._ev("x > 50 ? 1 : x > 5 ? 2 : 3", x=x), [3, 2, 1]
        )
        # ternary binds loosest: '1 + x > 5 ? 10 : 20' parses as
        # (1 + x > 5) ? ...
        np.testing.assert_array_equal(
            self._ev("1 + x > 5 ? 10 : 20", x=x), [20, 10, 10]
        )

    def test_modulo_and_bitwise_match_java(self):
        import numpy as np

        # Java: (long) casts truncate toward zero; % on doubles = fmod
        assert self._ev("7 % 3") == 1.0
        assert self._ev("-7 % 3") == -1.0
        assert self._ev("(12 & 10)") == 8.0
        assert self._ev("(12 | 3)") == 15.0
        assert self._ev("(12 ^ 10)") == 6.0
        assert self._ev("~5") == -6.0
        assert self._ev("3 << 4") == 48.0
        assert self._ev("-256 >> 4") == -16.0

    def test_reference_functions(self):
        import math

        import numpy as np

        assert self._ev("ln(exp(2))") == pytest.approx(2.0)
        assert self._ev("logn(2, 8)") == pytest.approx(3.0)
        assert self._ev("atan2(1, 1)") == pytest.approx(math.pi / 4)
        for f in ("sin", "cos", "tan", "sinh", "cosh", "tanh",
                  "asin", "acos", "atan"):
            got = float(self._ev(f"{f}(0.5)"))
            assert got == pytest.approx(getattr(math, f)(0.5)), f
        # the reference's TestExpressions haversin example: NYC points,
        # great-circle distance in km
        d = float(
            self._ev("haversin(40.7143528, -74.0059731, 40.759011, -73.9844722)")
        )
        assert d == pytest.approx(5.285, abs=2e-3)

    def test_parse_errors(self):
        from lucene_ray.search.expressions import (
            ExpressionError,
            compile_expression,
        )

        for bad in ("x ? 1", "x >", "1 ?? 2", "foo(1,2,3)", "x &&", "(x"):
            with pytest.raises(ExpressionError):
                compile_expression(bad)
