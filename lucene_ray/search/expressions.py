"""Compiled arithmetic expressions over doc values — the ``expressions``
module analog (expressions/src/java/org/apache/lucene/expressions/
Expression.java:57 compile-a-formula; js/JavascriptCompiler.java:120 +
Javascript.g grammar) feeding FunctionScoreQuery
(queries/.../function/FunctionScoreQuery.java:44).

The reference compiles a JavaScript-like formula to JVM bytecode bound to
DoubleValuesSources; here the same grammar compiles to a small AST
evaluated with numpy kernels over the candidate docids' value arrays —
vectorized per segment, never per doc.

Full grammar (precedence low -> high, matching Javascript.g):
    ternary  := or ('?' expr ':' ternary)?
    or       := and ('||' and)*
    and      := bitor ('&&' bitor)*
    bitor    := bitxor ('|' bitxor)*
    bitxor   := bitand ('^' bitand)*
    bitand   := eq ('&' eq)*
    eq       := rel (('=='|'!=') rel)*
    rel      := shift (('<'|'<='|'>'|'>=') shift)*
    shift    := add (('<<'|'>>') add)*
    add      := mul (('+'|'-') mul)*
    mul      := unary (('*'|'/'|'%') unary)*
    unary    := ('-'|'!'|'~') unary | atom
    atom     := NUMBER | IDENT | IDENT '(' args ')' | '(' expr ')'

Semantics follow JavascriptCompiler: comparisons/booleans produce 1.0/0.0
(truthiness = nonzero); bitwise/shift operate on (long) casts of the
double operands, like Java; '?:' evaluates both arms (vectorized
np.where — expressions are pure, so eagerness is unobservable).

Identifiers resolve at evaluate() time from a bindings dict: ``_score``
(the wrapped query's score, DoubleValuesSource.SCORES), any numeric
doc-values field, or ``doc_len`` (the norms-stored token count).
Functions are JavascriptCompiler's built-in set: abs, acos, asin, atan,
atan2, ceil, cos, cosh, exp, floor, haversin, ln, log (alias of ln),
log10, log1p, logn, max, min, pow, sin, sinh, sqrt, tan, tanh.
"""

from __future__ import annotations

import functools
import re

import numpy as np


def _haversin(lat1, lon1, lat2, lon2):
    """Great-circle distance in KM (expressions/js/JavascriptCompiler's
    haversin built-in -> SloppyMath.haversinMeters / 1000)."""
    r1, g1, r2, g2 = (np.radians(np.asarray(x, dtype=np.float64))
                      for x in (lat1, lon1, lat2, lon2))
    h = (
        np.sin((r2 - r1) / 2) ** 2
        + np.cos(r1) * np.cos(r2) * np.sin((g2 - g1) / 2) ** 2
    )
    return 2 * 6371.0087714 * np.arcsin(np.sqrt(h))


_FUNCS_1 = {
    "abs": np.abs,
    "acos": np.arccos,
    "asin": np.arcsin,
    "atan": np.arctan,
    "ceil": np.ceil,
    "cos": np.cos,
    "cosh": np.cosh,
    "exp": np.exp,
    "floor": np.floor,
    "ln": np.log,
    "log": np.log,       # kept from the round-3 subset (alias of ln)
    "log10": np.log10,
    "log1p": np.log1p,
    "sin": np.sin,
    "sinh": np.sinh,
    "sqrt": np.sqrt,
    "tan": np.tan,
    "tanh": np.tanh,
}
_FUNCS_2 = {
    "atan2": np.arctan2,
    "pow": np.power,
    "min": np.minimum,
    "max": np.maximum,
    # logn(base, x) — JavascriptCompiler's arbitrary-base log
    "logn": lambda base, x: np.log(x) / np.log(base),
}
_FUNCS_4 = {"haversin": _haversin}

# multi-char operators first so the lexer is longest-match
_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op><<|>>|<=|>=|==|!=|&&|\|\||[-+*/%(),?:<>!~&|^]))"
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

    def _binop_level(self, ops: tuple, next_level):
        node = next_level()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.take("op")
            node = (op, node, next_level())
        return node

    def expr(self):
        return self.ternary()

    def ternary(self):
        cond = self.or_()
        if self.peek() == ("op", "?"):
            self.take("op", "?")
            a = self.expr()
            self.take("op", ":")
            b = self.ternary()
            return ("?:", cond, a, b)
        return cond

    def or_(self):
        return self._binop_level(("||",), self.and_)

    def and_(self):
        return self._binop_level(("&&",), self.bitor)

    def bitor(self):
        return self._binop_level(("|",), self.bitxor)

    def bitxor(self):
        return self._binop_level(("^",), self.bitand)

    def bitand(self):
        return self._binop_level(("&",), self.eq)

    def eq(self):
        return self._binop_level(("==", "!="), self.rel)

    def rel(self):
        return self._binop_level(("<", "<=", ">", ">="), self.shift)

    def shift(self):
        return self._binop_level(("<<", ">>"), self.add)

    def add(self):
        return self._binop_level(("+", "-"), self.mul)

    def mul(self):
        return self._binop_level(("*", "/", "%"), self.unary)

    def unary(self):
        k, v = self.peek()
        if (k, v) == ("op", "-"):
            self.take("op")
            return ("neg", self.unary())
        if (k, v) == ("op", "!"):
            self.take("op")
            return ("not", self.unary())
        if (k, v) == ("op", "~"):
            self.take("op")
            return ("bnot", self.unary())
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
                if v in _FUNCS_4 and len(args) == 4:
                    return ("f4", v, *args)
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


def _to_long(x):
    # Java (long) cast of a double: truncate toward zero, saturating
    return np.asarray(np.trunc(np.asarray(x, dtype=np.float64)), dtype=np.int64)


def _bool(x):
    return np.asarray(x, dtype=np.float64) != 0.0


_BIN_EVAL = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: np.fmod(a, b),  # Java % on doubles = C fmod
    "<": lambda a, b: (a < b) * 1.0,
    "<=": lambda a, b: (a <= b) * 1.0,
    ">": lambda a, b: (a > b) * 1.0,
    ">=": lambda a, b: (a >= b) * 1.0,
    "==": lambda a, b: (a == b) * 1.0,
    "!=": lambda a, b: (a != b) * 1.0,
    "&&": lambda a, b: (_bool(a) & _bool(b)) * 1.0,
    "||": lambda a, b: (_bool(a) | _bool(b)) * 1.0,
    "&": lambda a, b: (_to_long(a) & _to_long(b)).astype(np.float64),
    "|": lambda a, b: (_to_long(a) | _to_long(b)).astype(np.float64),
    "^": lambda a, b: (_to_long(a) ^ _to_long(b)).astype(np.float64),
    # Java shifts mask the count to 6 bits for longs
    "<<": lambda a, b: (_to_long(a) << (_to_long(b) & 63)).astype(np.float64),
    ">>": lambda a, b: (_to_long(a) >> (_to_long(b) & 63)).astype(np.float64),
}


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
    if kind == "not":
        return (~_bool(_eval(node[1], bindings))) * 1.0
    if kind == "bnot":
        return (~_to_long(_eval(node[1], bindings))).astype(np.float64)
    if kind == "?:":
        return np.where(
            _bool(_eval(node[1], bindings)),
            _eval(node[2], bindings),
            _eval(node[3], bindings),
        )
    if kind == "f1":
        return _FUNCS_1[node[1]](_eval(node[2], bindings))
    if kind == "f2":
        return _FUNCS_2[node[1]](_eval(node[2], bindings), _eval(node[3], bindings))
    if kind == "f4":
        return _FUNCS_4[node[1]](*(_eval(a, bindings) for a in node[2:]))
    fn = _BIN_EVAL.get(kind)
    if fn is not None:
        return fn(_eval(node[1], bindings), _eval(node[2], bindings))
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
