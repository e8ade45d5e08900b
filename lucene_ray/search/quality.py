"""Judged search-quality metrics — the benchmark/quality package
(`benchmark/src/java/org/apache/lucene/benchmark/quality/QualityStats.java`,
`QualityBenchmark.java`, `trec/TrecJudge.java`).

QualityStats.addResult math verbatim (:81-101): at each rank n the running
precision p = goodSoFar / n; pAt[n] records it; a relevant hit adds p to
pReleventSum; avp = pReleventSum / maxGoodPoints (:122); recall =
goodSoFar / maxGoodPoints (or the running p when the judge knows no
relevant docs, maxGoodPoints <= 0); MRR = 1/rank of the FIRST relevant hit
but only when that rank <= 5 (:88 — the reference's top-5 quirk), else 0.

Float protocol: every p is one double division; pReleventSum accumulates
LEFT-ASSOCIATIVE in rank order — the SQL oracle folds the same chain with
an ordered list_reduce, so metric doubles are bit-identical.
"""

from __future__ import annotations


class QualityStats:
    """Single-query quality statistics (QualityStats.java)."""

    MAX_POINTS = 20

    def __init__(self, max_good_points: float):
        self.max_good_points = max_good_points
        self.num_points = 0
        self.num_good_points = 0
        self.p_relevant_sum = 0.0
        self.p_at = [0.0] * (self.MAX_POINTS + 1)  # pAt[0] unused
        self.mrr = 0.0
        self.recall = 0.0
        self.recall_points: list[tuple[int, int]] = []

    def add_result(self, n: int, is_relevant: bool) -> None:
        if n != self.num_points + 1:
            raise ValueError(f"point {n} illegal after {self.num_points}")
        if is_relevant:
            self.num_good_points += 1
            self.recall_points.append((n, self.num_good_points))
            if len(self.recall_points) == 1 and n <= 5:
                self.mrr = 1.0 / n
        self.num_points = n
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = (
            p
            if self.max_good_points <= 0
            else self.num_good_points / self.max_good_points
        )

    def get_precision_at(self, n: int) -> float:
        if not 1 <= n < len(self.p_at):
            raise ValueError(f"n={n} out of range")
        return self.p_at[n]

    def get_avp(self) -> float:
        return (
            0.0
            if self.max_good_points == 0
            else self.p_relevant_sum / self.max_good_points
        )

    def get_mrr(self) -> float:
        return self.mrr

    def get_recall(self) -> float:
        return self.recall


class SetJudge:
    """TrecJudge analog (trec/TrecJudge.java:90 isRelevant): a judgment is
    membership of the doc in the query's qrels set; maxRecall (:118) is
    the set size."""

    def __init__(self, qrels: dict[int, set]):
        self.qrels = qrels

    def is_relevant(self, doc, query_id: int) -> bool:
        return doc in self.qrels.get(query_id, ())

    def max_recall(self, query_id: int) -> int:
        return len(self.qrels.get(query_id, ()))


def execute_benchmark(ranked: dict[int, list], judge: SetJudge) -> dict[int, QualityStats]:
    """QualityBenchmark.execute (QualityBenchmark.java:113-130 analyzeQueryResults):
    walk each query's ranked doc list in order, judging every rank."""
    out = {}
    for qid, docs in ranked.items():
        st = QualityStats(float(judge.max_recall(qid)))
        for i, d in enumerate(docs):
            st.add_result(i + 1, judge.is_relevant(d, qid))
        out[qid] = st
    return out
