"""Query model + a mini classic-syntax parser.

Query types mirror the reference's relational surface (SURVEY.md §2.11):
TermQuery (search/TermQuery.java:36), BooleanQuery with MUST/SHOULD/MUST_NOT
and minimumShouldMatch (search/BooleanQuery.java, BooleanClause occurs),
PhraseQuery (search/PhraseQuery.java:69, exact only — slop=0).

Parser subset of the classic syntax (queryparser/.../classic/QueryParser.java:84):
  foo bar            -> SHOULD foo, SHOULD bar      (default OR)
  foo AND bar        -> MUST foo, MUST bar
  +foo bar -baz      -> MUST foo, SHOULD bar, MUST_NOT baz
  "foo bar"          -> PhraseQuery(foo, bar)
Query text runs through the same analyzer as indexing (Analyzer.normalize
semantics, analysis/standard/StandardAnalyzer.java:99-101); a query word that
analyzes to multiple tokens (e.g. ``fooBar``) expands to that many clauses
with the same occur.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TermQuery:
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery:
    """``slop`` > 0 enables sloppy matching (search/SloppyPhraseMatcher.java):
    a doc matches iff some selection of one occurrence per term has
    max(pos_i - i) - min(pos_j - j) <= slop over the offset-adjusted
    positions (so "a b"~2 matches "b a", "a b"~1 does not). Doc SETS match
    the reference; the engine's sloppy phrase freq is the greedy
    non-overlapping valid-window count (the reference's
    1/(1+matchLength)-weighted float freq is not ported — documented)."""

    terms: tuple
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class MultiPhraseQuery:
    """Phrase with term ALTERNATIVES per position
    (search/MultiPhraseQuery.java): position i matches if ANY of
    ``slots[i]`` occurs there; the doc matches if consecutive positions
    cover every slot. Scored like a phrase with idf summed over every term
    in every slot (MultiPhraseWeight's idfExplain over all termStats)."""

    slots: tuple  # of tuple[str, ...], one alternatives-tuple per position
    boost: float = 1.0

    @property
    def terms(self) -> tuple:
        return tuple(t for slot in self.slots for t in slot)


@dataclass(frozen=True)
class SpanNearQuery:
    """Proximity match over single-term sub-spans (queries/src/java/org/
    apache/lucene/queries/spans/SpanNearQuery.java; matchers
    NearSpansOrdered.java / NearSpansUnordered.java).

    ordered=True: positions p_1 < p_2 < ... < p_k (each sub-span starts
    after the previous one ends) with total gap
    p_k - p_1 - (k-1) <= slop.
    ordered=False: one occurrence per term inside a window of width
    max - min + 1 - k <= slop (order-free — distinct from sloppy
    PhraseQuery, whose offset-ADJUSTED span penalizes reordering).

    Repeated terms are rejected (the reference's repeats handling is not
    ported for spans; PhraseQuery(slop) covers that shape). Scored like a
    phrase (freq = greedy non-overlapping match count, engine-defined;
    doc SETS match the reference)."""

    terms: tuple
    slop: int = 0
    ordered: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery:
    """Multiple terms scored as ONE pseudo-term: per-doc tf = sum over
    synonyms, df = max over synonyms (search/SynonymQuery.java:50 blended
    semantics)."""

    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery:
    """score = max(sub-scores) + tie_breaker * (sum of the others)
    (search/DisjunctionMaxQuery.java)."""

    disjuncts: tuple  # of TermQuery/PhraseQuery
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class DisjunctionSumQuery:
    """Nested boolean OR evaluated as ONE clause: matches docs matched by
    ANY disjunct, score = sum of the matching disjuncts' scores — the shape
    a rewritten multi-term query takes inside a MUST slot
    (search/MultiTermQuery.java SCORING_BOOLEAN_REWRITE produces
    MUST(BooleanQuery(SHOULD expansions)); BooleanQuery.java nested-clause
    counting: the whole group is one clause for minimumShouldMatch)."""

    disjuncts: tuple  # of TermQuery (multi-term expansions)
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllDocsQuery:
    """Every doc, constant score = boost (search/MatchAllDocsQuery.java)."""

    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery:
    """Matches of ``query`` with constant score = boost
    (search/ConstantScoreQuery.java)."""

    query: object
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSetQuery:
    """Set-membership filter: matches docs containing ANY of the terms,
    constant score (search/TermInSetQuery.java — Occur.FILTER semantics)."""

    terms: tuple
    boost: float = 1.0


# ---- multi-term queries: rewritten against the term dictionary -----------
# (search/PrefixQuery.java / WildcardQuery / TermRangeQuery / FuzzyQuery —
# automaton-intersect-with-term-dict replaced by vocabulary scans; rewrite
# mode is SCORING_BOOLEAN_REWRITE: an OR of TermQuerys,
# search/MultiTermQuery.java SCORING_BOOLEAN_REWRITE)


@dataclass(frozen=True)
class PrefixQuery:
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery:
    pattern: str  # * = any run, ? = one char
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery:
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery:
    term: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery:
    """Full (anchored) regular-expression term match — compiled regex
    intersected with the vocabulary (search/RegexpQuery.java /
    AutomatonQuery.java; the automaton-FST walk becomes a vectorized vocab
    scan with a literal-prefix pre-slice). Python `re` syntax; the pattern
    must match the WHOLE term (fullmatch), as in the reference."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class PointRangeQuery:
    """Numeric doc-values range filter, bounds INCLUSIVE, constant score
    (search/PointRangeQuery.java over the 1-D points table; None = open)."""

    field: str
    lower: int | None
    upper: int | None
    boost: float = 1.0


@dataclass
class BooleanQuery:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    min_should_match: int = 0

    def freeze(self, boost: float = 1.0) -> "NestedBooleanQuery":
        return NestedBooleanQuery(
            tuple(self.must), tuple(self.should), tuple(self.must_not),
            self.min_should_match, boost,
        )

    def all_terms(self) -> list[str]:
        out = []
        for q in self.must + self.should + self.must_not:
            if isinstance(q, TermQuery):
                out.append(q.term)
            elif isinstance(q, PhraseQuery):
                out.extend(q.terms)
        return out


@dataclass(frozen=True)
class FeatureQuery:
    """Static-signal ranking clause (document/FeatureField.java +
    FeatureField.newSaturationQuery/newLogQuery): score derives from a
    per-doc NUMERIC doc value, not term statistics. function='log':
    weight * ln(1 + value); 'saturation': weight * value / (value + pivot).
    Matches every live doc whose value > 0 (FeatureField only indexes
    positive feature values). Composes with BM25 clauses as a plain
    additive SHOULD/MUST clause — the 'boost by pagerank' shape."""

    field: str
    weight: float = 1.0
    function: str = "log"
    pivot: float = 1.0  # saturation only


@dataclass(frozen=True)
class ToParentBlockJoinQuery:
    """Parent-child block join (join/.../ToParentBlockJoinQuery.java):
    documents are indexed in BLOCKS — children first, their parent LAST,
    contiguous docids (IndexWriter.addDocuments). A parent matches when any
    of its children matches ``child_query``; ``parents_filter`` identifies
    parent docs (the BitSetProducer role — typically a keyword-field term).
    score_mode: 'max' | 'sum' | 'none' over the matching children's scores
    (ScoreMode.Max/Total/None)."""

    child_query: object
    parents_filter: object
    score_mode: str = "max"


@dataclass(frozen=True)
class NestedBooleanQuery:
    """A full BooleanQuery evaluated as ONE clause of an enclosing boolean
    — the reference's nested-clause shape (BooleanQuery.java clauses may
    themselves be BooleanQuery; QueryParser.jj Clause recursion). Matching
    docs follow the inner MUST/SHOULD/MUST_NOT algebra; score = boost * sum
    of the inner matching scoring clauses; the whole group counts as one
    clause for the outer minimumShouldMatch."""

    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    min_should_match: int = 0
    boost: float = 1.0

    def to_boolean(self) -> BooleanQuery:
        return BooleanQuery(
            list(self.must), list(self.should), list(self.must_not),
            self.min_should_match,
        )


_TOKEN_RE = re.compile(
    r'"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?'      # "phrase"~slop^boost
    r"|([+-]?)\(([^()]*)\)(?:\^(\d+(?:\.\d+)?))?"       # +(group of terms)^boost
    r"|(\S+)"                                            # bare word
)
_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")
_FUZZY_RE = re.compile(r"^(.*?)~(\d?)$")
_FIELD_RE = re.compile(r"^([a-zA-Z_]+):(.+)$")


def _token_queries(w, is_phrase, boost, slop, analyzer) -> list:
    """Queries for ONE parsed token: field-scoped term/wildcard, fuzzy,
    wildcard, phrase, or analyzed term(s). Shared by the top-level parser
    and parenthesized groups."""
    if not is_phrase:
        fm = _FIELD_RE.match(w)
        if fm:
            from lucene_ray.config import KEYWORD_FIELDS

            fld, val = fm.group(1), fm.group(2)
            if fld in KEYWORD_FIELDS:
                # StringField semantics: the value is NOT analyzed
                # (queryparser/.../classic/QueryParser.java:84 field
                # scoping; document/StringField.java exact terms)
                if "*" in val or "?" in val:
                    return [WildcardQuery(f"{fld}:{val}", boost=boost)]
                return [TermQuery(f"{fld}:{val}", boost=boost)]
            if fld == "content":
                w = val  # the default field — analyze normally
        m = _FUZZY_RE.match(w)
        if m and m.group(1):
            toks = analyzer.tokenize_text(m.group(1))
            if toks:
                edits = int(m.group(2)) if m.group(2) else 2
                return [FuzzyQuery("".join(toks), max_edits=edits, boost=boost)]
            return []
        if "*" in w or "?" in w:
            return [WildcardQuery(w.lower(), boost=boost)]
    toks = analyzer.tokenize_text(w)
    if not toks:
        return []
    if is_phrase and len(toks) > 1:
        return [PhraseQuery(tuple(toks), boost=boost, slop=slop)]
    return [TermQuery(t, boost=boost) for t in toks]


def _scale_boost(q, factor: float):
    if factor == 1.0:
        return q
    import dataclasses

    if hasattr(q, "boost"):
        return dataclasses.replace(q, boost=getattr(q, "boost", 1.0) * factor)
    return q


def _group_clause(sub: BooleanQuery, boost: float):
    """One clause from a parsed parenthesized group (QueryParser.jj Clause
    -> nested BooleanQuery). A pure-SHOULD group stays a
    DisjunctionSumQuery (same semantics, pruning-friendly); any
    MUST/MUST_NOT structure becomes a NestedBooleanQuery."""
    if not (sub.must or sub.should or sub.must_not):
        return None
    if not sub.must and not sub.must_not and sub.min_should_match <= 1:
        disjuncts = tuple(_scale_boost(q, boost) for q in sub.should)
        if len(disjuncts) == 1:
            return disjuncts[0]
        return DisjunctionSumQuery(disjuncts)
    return sub.freeze(boost)


def parse_query(text: str, analyzer) -> BooleanQuery:
    return _parse_tokens(_TOKEN_RE.findall(text), analyzer)


def _parse_tokens(raw: list[tuple], analyzer, depth: int = 0) -> BooleanQuery:
    bq = BooleanQuery()
    # (occur, text, kind, boost, slop) where kind is "word"|"phrase"|"group"
    words: list[tuple] = []
    conj_and = False
    pending_occur = None
    for phrase, pslop, pboost, gsign, gbody, gboost, word in raw:
        if word in ("AND", "&&"):
            conj_and = True
            continue
        if word in ("OR", "||"):
            continue
        if word == "NOT":
            pending_occur = "must_not"
            continue
        occur = pending_occur or "should"
        pending_occur = None
        if phrase:
            words.append(
                (occur, phrase, "phrase", float(pboost) if pboost else 1.0,
                 int(pslop) if pslop else 0)
            )
            continue
        if gbody:
            if gsign == "+":
                occur = "must"
            elif gsign == "-":
                occur = "must_not"
            words.append(
                (occur, gbody, "group", float(gboost) if gboost else 1.0, 0)
            )
            continue
        if word.startswith("+") and len(word) > 1:
            occur, word = "must", word[1:]
        elif word.startswith("-") and len(word) > 1:
            occur, word = "must_not", word[1:]
        boost = 1.0
        m = _BOOST_RE.match(word)
        if m and m.group(1):
            word, boost = m.group(1), float(m.group(2))
        words.append((occur, word, "word", boost, 0))

    for occur, w, kind, boost, slop in words:
        eff = occur
        if conj_and and occur == "should":
            eff = "must"
        if kind == "group":
            if depth > 0:
                raise ValueError("nested parentheses beyond one level are not supported")
            sub = _parse_tokens(_TOKEN_RE.findall(w), analyzer, depth + 1)
            clause = _group_clause(sub, boost)
            if clause is None:
                continue
            getattr(bq, eff).append(clause)
            continue
        # eff, not occur: explicit AND promotes phrases to MUST too
        for q in _token_queries(w, kind == "phrase", boost, slop, analyzer):
            getattr(bq, eff).append(q)
    return bq


def iter_clauses(bq: BooleanQuery):
    """Every clause of ``bq`` including nested disjuncts / wrapped
    subqueries / nested-boolean members (the canonical clause walk shared
    by scorer building, term-stat collection, and rewrite detection)."""
    stack = list(bq.must + bq.should + bq.must_not)
    while stack:
        q = stack.pop()
        yield q
        if isinstance(q, (DisjunctionMaxQuery, DisjunctionSumQuery)):
            stack.extend(q.disjuncts)
        elif isinstance(q, ConstantScoreQuery):
            stack.append(q.query)
        elif isinstance(q, NestedBooleanQuery):
            stack.extend(q.must + q.should + q.must_not)
        elif isinstance(q, ToParentBlockJoinQuery):
            stack.append(q.child_query)
            stack.append(q.parents_filter)
