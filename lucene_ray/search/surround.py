"""Surround query language parser (queryparser/surround/parser/
QueryParser.jj): the span-oriented DSL — ``W`` (ordered) and ``N``
(unordered) distance operators with an optional distance prefix (``3W``,
``5N``; distance d lowers to span slop d-1, surround/query/
DistanceQuery.java:97), boolean ``AND`` / ``OR`` / ``NOT``, all operators
case-insensitive, non-unary operators in both infix (``a AND b``,
``a 3w b``) and prefix (``AND(a, b)``, ``3W(a, b)``) form, ``*`` / ``?``
truncation. Precedence (loosest to tightest): OR, AND, NOT, N, W —
the .jj production chain.

Lowering: distance operators become SpanNearQuery over span sources
(SpanTermQuery / SpanOrQuery / SpanMultiTermWrapper for truncations);
boolean operators become BooleanQuery algebra (nested levels freeze into
NestedBooleanQuery). AND/NOT inside a distance operator raise, as in the
reference (only DistanceSubQuery implementors compose there —
surround/query/AndQuery.java lacks it). Field scoping and ^boost are not
ported (single content field; documented)."""

from __future__ import annotations

import re

from lucene_ray.search.query import (
    BooleanQuery,
    NestedBooleanQuery,
    PrefixQuery,
    SpanMultiTermWrapper,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(r"\(|\)|,|[^\s(),]+")
_DIST_RE = re.compile(r"^(\d*)([wn])$", re.IGNORECASE)


class SurroundParseError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def _op_kind(tok: str):
    """('or'|'and'|'not'|'w'|'n', distance) or None."""
    low = tok.lower()
    if low in ("or", "and", "not"):
        return low, 0
    m = _DIST_RE.match(tok)
    if m:
        return m.group(2).lower(), int(m.group(1) or "1")
    return None


class _Node:
    __slots__ = ("op", "children", "distance", "word")

    def __init__(self, op, children=(), distance=0, word=None):
        self.op = op  # 'or'|'and'|'not'|'w'|'n'|'term'
        self.children = list(children)
        self.distance = distance
        self.word = word


class SurroundQueryParser:
    """parse(text) -> engine-ready BooleanQuery."""

    def __init__(self, analyzer=None):
        from lucene_ray.analysis import get_analyzer

        self.analyzer = analyzer or get_analyzer("code")

    def parse(self, text: str) -> BooleanQuery:
        self._toks = _tokenize(text)
        self._i = 0
        node = self._or()
        if self._i != len(self._toks):
            raise SurroundParseError(
                f"unconsumed input at {self._toks[self._i]!r}"
            )
        return self._lower_top(node)

    # ---------------------------------------------------------- tokenizing
    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _take(self):
        tok = self._peek()
        if tok is None:
            raise SurroundParseError("unexpected end of query")
        self._i += 1
        return tok

    # --------------------------------------------------- recursive descent
    def _infix_level(self, kinds: tuple, next_level):
        node = next_level()
        children = [node]
        op = None
        dist = 0
        while True:
            tok = self._peek()
            k = _op_kind(tok) if tok and tok not in "(),"else None
            if not k or k[0] not in kinds:
                break
            # ".jj: keep only last used operator" for chained infix
            op, dist = k
            self._take()
            children.append(next_level())
        if len(children) == 1:
            return node
        return _Node(op, children, dist)

    def _or(self):
        return self._infix_level(("or",), self._and)

    def _and(self):
        return self._infix_level(("and",), self._not)

    def _not(self):
        return self._infix_level(("not",), self._n)

    def _n(self):
        return self._infix_level(("n",), self._w)

    def _w(self):
        return self._infix_level(("w",), self._primary)

    def _primary(self):
        tok = self._take()
        if tok == "(":
            node = self._or()
            if self._take() != ")":
                raise SurroundParseError("expected ')'")
            return node
        if tok in "),":
            raise SurroundParseError(f"unexpected {tok!r}")
        k = _op_kind(tok)
        if k and self._peek() == "(":
            # prefix form: OP(a, b, ...) — NOT has no prefix form (.jj)
            op, dist = k
            if op == "not":
                raise SurroundParseError("NOT has no prefix form")
            self._take()  # '('
            children = [self._or()]
            while self._peek() == ",":
                self._take()
                children.append(self._or())
            if self._take() != ")":
                raise SurroundParseError("expected ')'")
            return _Node(op, children, dist)
        return _Node("term", word=tok)

    # ------------------------------------------------------------ lowering
    def _lower_top(self, node: _Node):
        if node.op == "term":
            q = self._term_query(node.word)
            return BooleanQuery(should=[q])
        if node.op in ("w", "n"):
            return BooleanQuery(should=[self._lower_span(node)])
        if node.op == "or":
            return BooleanQuery(
                should=[self._clause(c) for c in node.children]
            )
        if node.op == "and":
            return BooleanQuery(must=[self._clause(c) for c in node.children])
        if node.op == "not":
            # a NOT b NOT c == a AND -b AND -c (ComposedQuery And semantics)
            head, *rest = node.children
            return BooleanQuery(
                must=[self._clause(head)],
                must_not=[self._clause(c) for c in rest],
            )
        raise SurroundParseError(f"cannot lower {node.op}")

    def _clause(self, node: _Node):
        """One clause of an enclosing boolean."""
        if node.op == "term":
            return self._term_query(node.word)
        if node.op in ("w", "n"):
            return self._lower_span(node)
        return self._lower_top(node).freeze()

    def _lower_span(self, node: _Node):
        if node.op == "term":
            return self._span_source(node.word)
        if node.op == "or":
            return SpanOrQuery(
                tuple(self._lower_span(c) for c in node.children)
            )
        if node.op in ("w", "n"):
            return SpanNearQuery(
                tuple(self._lower_span(c) for c in node.children),
                slop=node.distance - 1,
                ordered=node.op == "w",
            )
        raise SurroundParseError(
            f"{node.op.upper()} cannot appear inside a distance operator"
        )

    def _term_query(self, word: str):
        if "*" in word or "?" in word:
            return WildcardQuery(word.lower())
        toks = self.analyzer.tokenize_text(word)
        if len(toks) != 1:
            raise SurroundParseError(
                f"word {word!r} analyzes to {len(toks)} tokens"
            )
        return TermQuery(toks[0])

    def _span_source(self, word: str):
        if "*" in word or "?" in word:
            low = word.lower()
            if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
                return SpanMultiTermWrapper(PrefixQuery(low[:-1]))
            return SpanMultiTermWrapper(WildcardQuery(low))
        toks = self.analyzer.tokenize_text(word)
        if len(toks) != 1:
            raise SurroundParseError(
                f"word {word!r} analyzes to {len(toks)} tokens"
            )
        return SpanTermQuery(toks[0])
