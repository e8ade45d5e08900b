"""Compiled arithmetic expressions over doc values — the ``expressions``
module analog (expressions/src/java/org/apache/lucene/expressions/
Expression.java:57 compile-a-formula; js/JavascriptCompiler.java:120
grammar subset) feeding FunctionScoreQuery
(queries/.../function/FunctionScoreQuery.java:44).

The reference compiles a JavaScript-like formula to JVM bytecode bound to
DoubleValuesSources; here the same arithmetic subset compiles to a small
AST evaluated with numpy kernels over the candidate docids' value arrays —
vectorized per segment, never per doc.

Grammar (precedence low->high):
    expr    := term (('+'|'-') term)*
    term    := unary (('*'|'/') unary)*
    unary   := '-' unary | atom
    atom    := NUMBER | IDENT | IDENT '(' expr (',' expr)* ')' | '(' expr ')'

Identifiers resolve at evaluate() time from a bindings dict: ``_score``
(the wrapped query's score, DoubleValuesSource.SCORES), any numeric
doc-values field, or ``doc_len`` (the norms-stored token count).
Functions mirror JavascriptCompiler's built-ins subset: log (natural),
log10, log1p, exp, sqrt, abs, floor, ceil, pow, min, max.
"""

from __future__ import annotations

import functools
import re

import numpy as np

_FUNCS_1 = {
    "log": np.log,
    "log10": np.log10,
    "log1p": np.log1p,
    "exp": np.exp,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "floor": np.floor,
    "ceil": np.ceil,
}
_FUNCS_2 = {
    "pow": np.power,
    "min": np.minimum,
    "max": np.maximum,
}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[-+*/(),]))"
)


class ExpressionError(ValueError):
    pass


def _lex(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None or m.end() == pos:
            raise ExpressionError(f"bad character at {pos} in {src!r}")
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("ident") is not None:
            out.append(("ident", m.group("ident")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    out.append(("end", ""))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], src: str):
        self.toks = toks
        self.i = 0
        self.src = src
        self.variables: set[str] = set()

    def peek(self):
        return self.toks[self.i]

    def take(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val and v != val):
            raise ExpressionError(
                f"expected {val or kind}, got {v or k!r} in {self.src!r}"
            )
        self.i += 1
        return v

    def expr(self):
        node = self.term()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            op = self.take("op")
            node = (op, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            op = self.take("op")
            node = (op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.take("op")
            return ("neg", self.unary())
        return self.atom()

    def atom(self):
        k, v = self.peek()
        if k == "num":
            self.take()
            return ("const", float(v))
        if k == "ident":
            self.take()
            if self.peek() == ("op", "("):
                self.take("op", "(")
                args = [self.expr()]
                while self.peek() == ("op", ","):
                    self.take("op", ",")
                    args.append(self.expr())
                self.take("op", ")")
                if v in _FUNCS_1 and len(args) == 1:
                    return ("f1", v, args[0])
                if v in _FUNCS_2 and len(args) == 2:
                    return ("f2", v, args[0], args[1])
                raise ExpressionError(
                    f"unknown function {v}/{len(args)} in {self.src!r}"
                )
            self.variables.add(v)
            return ("var", v)
        if (k, v) == ("op", "("):
            self.take("op", "(")
            node = self.expr()
            self.take("op", ")")
            return node
        raise ExpressionError(f"unexpected {v or k!r} in {self.src!r}")


def _eval(node, bindings: dict):
    kind = node[0]
    if kind == "const":
        return node[1]
    if kind == "var":
        try:
            return bindings[node[1]]
        except KeyError:
            raise ExpressionError(f"unbound variable {node[1]!r}") from None
    if kind == "neg":
        return -_eval(node[1], bindings)
    if kind == "+":
        return _eval(node[1], bindings) + _eval(node[2], bindings)
    if kind == "-":
        return _eval(node[1], bindings) - _eval(node[2], bindings)
    if kind == "*":
        return _eval(node[1], bindings) * _eval(node[2], bindings)
    if kind == "/":
        return _eval(node[1], bindings) / _eval(node[2], bindings)
    if kind == "f1":
        return _FUNCS_1[node[1]](_eval(node[2], bindings))
    if kind == "f2":
        return _FUNCS_2[node[1]](_eval(node[2], bindings), _eval(node[3], bindings))
    raise ExpressionError(f"bad node {node!r}")


class CompiledExpression:
    """Parsed formula; ``variables`` is the free-identifier set the caller
    must bind (float64 numpy arrays or scalars)."""

    __slots__ = ("source", "variables", "_ast")

    def __init__(self, source: str):
        p = _Parser(_lex(source), source)
        self._ast = p.expr()
        p.take("end")
        self.source = source
        self.variables = frozenset(p.variables)

    def evaluate(self, bindings: dict) -> np.ndarray:
        return _eval(self._ast, bindings)

    def __repr__(self):
        return f"CompiledExpression({self.source!r})"


@functools.lru_cache(maxsize=512)
def compile_expression(source: str) -> CompiledExpression:
    """Compile (memoized — query objects carry the SOURCE string so they
    stay frozen/hashable for the per-reader LRUQueryCache)."""
    return CompiledExpression(source)
