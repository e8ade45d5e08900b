"""MoreLikeThis: build a query from an example document's "interesting"
terms.

Spec (reference ``queries/mlt/MoreLikeThis.java`` — createQueue()'s
interestingness ranking): every term of the seed text with
``tf >= min_term_freq`` and corpus ``df >= min_doc_freq`` is scored

    score = tf * idf,   idf = 1 + ln(N / (df + 1))

(ClassicSimilarity.idf, ``search/similarity/ClassicSimilarity.java``),
the top ``max_query_terms`` by (score desc, term asc) are kept, and the
result query is a SHOULD-of-TermQuery BooleanQuery (MoreLikeThis.like()).
The reference boosts each clause by score/best_score when boost=true; we
keep unboosted clauses (boost=false default) so the matching DOC SET is
float-free and exactly SQL-checkable.

Determinism/oracle invariants (CLAUDE.md): idf uses ``math.log`` (libm ln
== DuckDB ln bit-for-bit), the score is the plain double product
``tf * (1 + ln(N/(df+1)))`` evaluated in that exact operation order on
both sides, and ties break on the term string ascending.
"""

from __future__ import annotations

import math
from collections import Counter

from lucene_ray.search.query import BooleanQuery, TermQuery

MLT_MAX_QUERY_TERMS = 5   # reference default 25; scaled to the test corpus
MLT_MIN_TERM_FREQ = 2     # MoreLikeThis.java DEFAULT_MIN_TERM_FREQ
MLT_MIN_DOC_FREQ = 2      # reference default 5; scaled to the test corpus


def select_mlt_terms(
    reader,
    text: str,
    analyzer,
    max_query_terms: int = MLT_MAX_QUERY_TERMS,
    min_term_freq: int = MLT_MIN_TERM_FREQ,
    min_doc_freq: int = MLT_MIN_DOC_FREQ,
) -> list[str]:
    """Top interesting terms of ``text`` against ``reader``'s corpus stats,
    ordered by (tf*idf desc, term asc)."""
    tfs = Counter(analyzer.tokenize_text(text))
    cand = sorted(t for t, c in tfs.items() if c >= min_term_freq)
    if not cand:
        return []
    stats = reader.global_term_stats(cand)
    n = float(reader.stats_doc_count)
    scored = []
    for t in cand:
        df = stats.get(t, (0, 0))[0]
        if df < min_doc_freq:
            continue
        idf = 1.0 + math.log(n / (df + 1.0))
        scored.append((-(tfs[t] * idf), t))
    scored.sort()
    return [t for _, t in scored[:max_query_terms]]


def select_mlt_terms_from_tv(
    reader,
    docid: int,
    max_query_terms: int = MLT_MAX_QUERY_TERMS,
    min_term_freq: int = MLT_MIN_TERM_FREQ,
    min_doc_freq: int = MLT_MIN_DOC_FREQ,
) -> list[str]:
    """select_mlt_terms sourced from the seed doc's TERM VECTOR instead of
    re-analyzing stored text — MoreLikeThis.retrieveTerms(int docNum)'s
    fast path (MoreLikeThis.java: 'if (vector != null) ...'). Identical
    output to the re-analysis path by construction (term vectors store the
    exact per-doc (term, freq) stream); pinned by
    tests/test_termvectors.py::test_mlt_tv_matches_reanalysis."""
    tv = reader.term_vectors([docid])
    tfs = dict(zip(tv.column("term").to_pylist(), tv.column("freq").to_pylist()))
    cand = sorted(t for t, c in tfs.items() if c >= min_term_freq)
    if not cand:
        return []
    stats = reader.global_term_stats(cand)
    n = float(reader.stats_doc_count)
    scored = []
    for t in cand:
        df = stats.get(t, (0, 0))[0]
        if df < min_doc_freq:
            continue
        idf = 1.0 + math.log(n / (df + 1.0))
        scored.append((-(tfs[t] * idf), t))
    scored.sort()
    return [t for _, t in scored[:max_query_terms]]


class MoreLikeThisQuery:
    """queries/mlt/MoreLikeThisQuery.java — the LAZY form the XML
    LikeThisQuery element builds: rewrite(reader) selects the MLT terms
    and applies percentTermsToMatch as minimumNumberShouldMatch
    (MoreLikeThisQuery.rewrite)."""

    def __init__(
        self,
        like_text: str,
        analyzer,
        max_query_terms: int = 20,
        min_term_freq: int = 1,
        min_doc_freq: int = MLT_MIN_DOC_FREQ,
        percent_terms_to_match: float = 0.3,
        boost: float = 1.0,
    ):
        self.like_text = like_text
        self.analyzer = analyzer
        self.max_query_terms = max_query_terms
        self.min_term_freq = min_term_freq
        self.min_doc_freq = min_doc_freq
        self.percent_terms_to_match = percent_terms_to_match
        self.boost = boost

    def rewrite(self, reader) -> BooleanQuery:
        bq = more_like_this(
            reader,
            self.like_text,
            self.analyzer,
            max_query_terms=self.max_query_terms,
            min_term_freq=self.min_term_freq,
            min_doc_freq=self.min_doc_freq,
        )
        bq.min_should_match = int(
            len(bq.should) * self.percent_terms_to_match
        )
        if self.boost != 1.0:
            bq.should = [
                TermQuery(t.term, boost=t.boost * self.boost)
                for t in bq.should
            ]
        return bq


def more_like_this(
    reader,
    text: str,
    analyzer,
    max_query_terms: int = MLT_MAX_QUERY_TERMS,
    min_term_freq: int = MLT_MIN_TERM_FREQ,
    min_doc_freq: int = MLT_MIN_DOC_FREQ,
) -> BooleanQuery:
    """The MoreLikeThis query for ``text``: SHOULD over the selected terms
    (empty BooleanQuery when nothing qualifies — matches no docs)."""
    terms = select_mlt_terms(
        reader, text, analyzer, max_query_terms, min_term_freq, min_doc_freq
    )
    return BooleanQuery(should=[TermQuery(t) for t in terms])
