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
    terms: tuple
    boost: float = 1.0


@dataclass
class BooleanQuery:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    min_should_match: int = 0

    def all_terms(self) -> list[str]:
        out = []
        for q in self.must + self.should + self.must_not:
            if isinstance(q, TermQuery):
                out.append(q.term)
            elif isinstance(q, PhraseQuery):
                out.extend(q.terms)
        return out


_TOKEN_RE = re.compile(r'"([^"]*)"|(\S+)')


def parse_query(text: str, analyzer) -> BooleanQuery:
    bq = BooleanQuery()
    raw = _TOKEN_RE.findall(text)
    words: list[tuple[str, str, bool]] = []  # (occur, text, is_phrase)
    conj_and = False
    pending_occur = None
    for phrase, word in raw:
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
            words.append((occur, phrase, True))
            continue
        if word.startswith("+") and len(word) > 1:
            occur, word = "must", word[1:]
        elif word.startswith("-") and len(word) > 1:
            occur, word = "must_not", word[1:]
        words.append((occur, word, False))

    for occur, w, is_phrase in words:
        toks = analyzer.tokenize_text(w)
        if not toks:
            continue
        if is_phrase and len(toks) > 1:
            q = PhraseQuery(tuple(toks))
            getattr(bq, occur if occur != "should" else "should").append(q)
            continue
        eff = occur
        if conj_and and occur == "should":
            eff = "must"
        for t in toks:
            getattr(bq, eff).append(TermQuery(t))
    return bq
