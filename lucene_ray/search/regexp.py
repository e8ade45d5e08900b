"""Lucene RegExp — util/automaton/RegExp.java's grammar compiled to a
CharDFA (search/automaton.py) instead of Python ``re``.

Grammar (RegExp.java:1077-1276, default flags = ALL):

    unionexp   := interexp ( '|' unionexp )?
    interexp   := concatexp ( '&' interexp )?            [INTERSECTION]
    concatexp  := repeatexp concatexp?
    repeatexp  := repeatexp ('?' | '*' | '+' | {n} | {n,} | {n,m})*
    charclass  := '[' '^'? (char | char '-' char | \\pre)+ ']'
    simpleexp  := char | '.' | '#' [EMPTY] | '@' [ANYSTRING]
                | '"' <literal> '"' | '(' ')' | '(' unionexp ')'
                | '<' n '-' m '>' [INTERVAL] | '\\' char
    predefined := \\d \\D \\s \\S \\w \\W (RegExp.expandPredefined)

Everything Lucene supports is here except named automata
('<identifier>' needs an AutomatonProvider — raises, as the reference
does without one). Matching is ANCHORED (whole term), matching the
reference's toAutomaton contract. The compiler builds a RegExp AST, emits
a Thompson NFA per node (fresh states per emission, so {n,m} repeats can
re-emit subtrees), and determinizes via automaton.py's range subset
construction; '&' determinizes both sides and embeds their product DFA.
``<n-m>`` uses the Automata.makeDecimalInterval semantics: equal-length
bounds fix the digit count, otherwise any number of leading zeros is
accepted.
"""

from __future__ import annotations

from lucene_ray.search.automaton import MAX_CP, CharDFA, _determinize

_PRE_CLASS = {
    "d": [(ord("0"), ord("9"))],
    "s": [(ord("\t"), ord("\n")), (ord("\r"), ord("\r")), (ord(" "), ord(" "))],
    "w": [
        (ord("0"), ord("9")),
        (ord("A"), ord("Z")),
        (ord("_"), ord("_")),
        (ord("a"), ord("z")),
    ],
}


def _complement_ranges(ranges):
    """Single-char class negation: the gaps of the sorted range union."""
    rs = sorted(ranges)
    out, cur = [], 0
    for lo, hi in rs:
        if lo > cur:
            out.append((cur, lo - 1))
        cur = max(cur, hi + 1)
    if cur <= MAX_CP:
        out.append((cur, MAX_CP))
    return out


def _pre_ranges(ch: str):
    base = _PRE_CLASS[ch.lower()]
    return base if ch.islower() else _complement_ranges(base)


# ---------------------------------------------------------------------- AST
# nodes: ("ranges", [(lo,hi)...]) | ("string", s) | ("concat", a, b)
# | ("union", a, b) | ("inter", a, b) | ("star", a) | ("repeat", a, n, m|None)
# | ("opt", a) | ("empty_lang",) | ("anystring",) | ("interval", n, m, digits)


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    # ------------------------------------------------------------- plumbing
    def more(self) -> bool:
        return self.pos < len(self.s)

    def peek(self, chars: str) -> bool:
        return self.more() and self.s[self.pos] in chars

    def match(self, c: str) -> bool:
        if self.peek(c):
            self.pos += 1
            return True
        return False

    def next(self) -> str:
        if not self.more():
            raise ValueError(f"unexpected end of string: {self.s!r}")
        c = self.s[self.pos]
        self.pos += 1
        return c

    # --------------------------------------------------------------- levels
    def parse(self):
        e = self.union_exp()
        if self.more():
            raise ValueError(f"end-of-string expected at position {self.pos}")
        return e

    def union_exp(self):
        e = self.inter_exp()
        while self.match("|"):
            e = ("union", e, self.inter_exp())
        return e

    def inter_exp(self):
        e = self.concat_exp()
        while self.match("&"):
            e = ("inter", e, self.concat_exp())
        return e

    def concat_exp(self):
        e = self.repeat_exp()
        while self.more() and not self.peek(")|") and not self.peek("&"):
            e = ("concat", e, self.repeat_exp())
        return e

    def repeat_exp(self):
        e = self.charclass_exp()
        while self.peek("?*+{"):
            if self.match("?"):
                e = ("opt", e)
            elif self.match("*"):
                e = ("star", e)
            elif self.match("+"):
                e = ("concat", e, ("star", e))
            else:
                self.match("{")
                start = self.pos
                while self.peek("0123456789"):
                    self.next()
                if start == self.pos:
                    raise ValueError(f"integer expected at position {self.pos}")
                n = int(self.s[start:self.pos])
                m = None
                if self.match(","):
                    start = self.pos
                    while self.peek("0123456789"):
                        self.next()
                    if start != self.pos:
                        m = int(self.s[start:self.pos])
                else:
                    m = n
                if not self.match("}"):
                    raise ValueError(f"expected '}}' at position {self.pos}")
                if m is not None and n > m:
                    raise ValueError(
                        f"invalid repetition range(out of order): {n}..{m}"
                    )
                e = ("repeat", e, n, m)
        return e

    def charclass_exp(self):
        if self.match("["):
            negate = self.match("^")
            # at least one class member is consumed unconditionally
            # (RegExp.parseCharClasses — "[]" is an unterminated class)
            ranges = list(self.char_class())
            while self.more() and not self.peek("]"):
                ranges.extend(self.char_class())
            if not self.match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            if negate:
                ranges = _complement_ranges(ranges)
            return ("ranges", ranges)
        return self.simple_exp()

    def char_class(self):
        pre = self._predefined()
        if pre is not None:
            return pre
        c = self.char_exp()
        if self.match("-"):
            c2 = self.char_exp()
            if ord(c) > ord(c2):
                return []  # makeCharRange(from > to) matches nothing
            return [(ord(c), ord(c2))]
        return [(ord(c), ord(c))]

    def _predefined(self):
        """\\d \\D \\s \\S \\w \\W (RegExp.matchPredefinedCharacterClass);
        any other escaped char is a literal (handled by char_exp)."""
        if self.peek("\\") and self.pos + 1 < len(self.s):
            nxt = self.s[self.pos + 1]
            if nxt in "dDwWsS":
                self.pos += 2
                return _pre_ranges(nxt)
        return None

    def simple_exp(self):
        if self.match("."):
            return ("ranges", [(0, MAX_CP)])
        if self.match("#"):
            return ("empty_lang",)
        if self.match("@"):
            return ("anystring",)
        if self.match('"'):
            start = self.pos
            while self.more() and not self.peek('"'):
                self.next()
            if not self.match('"'):
                raise ValueError(f"expected '\"' at position {self.pos}")
            return ("string", self.s[start:self.pos - 1])
        if self.match("("):
            if self.match(")"):
                return ("string", "")
            e = self.union_exp()
            if not self.match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return e
        if self.match("<"):
            start = self.pos
            while self.more() and not self.peek(">"):
                self.next()
            if not self.match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            body = self.s[start:self.pos - 1]
            i = body.find("-")
            if i == -1:
                raise ValueError(
                    "named automata need an AutomatonProvider "
                    f"(<{body}> at position {self.pos})"
                )
            if (
                i == 0
                or i == len(body) - 1
                or i != body.rfind("-")
                or not body[:i].isdigit()
                or not body[i + 1:].isdigit()
            ):
                raise ValueError(f"interval syntax error at position {self.pos}")
            smin, smax = body[:i], body[i + 1:]
            imin, imax = int(smin), int(smax)
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return ("interval", imin, imax, digits)
        pre = self._predefined()
        if pre is not None:
            return ("ranges", pre)
        c = self.char_exp()
        return ("ranges", [(ord(c), ord(c))])

    def char_exp(self) -> str:
        self.match("\\")
        return self.next()


# ----------------------------------------------------------------- NFA emit


class _Arena:
    """Growing NFA: eps[i] = epsilon targets, ranges[i] = [(lo, hi, dst)]."""

    def __init__(self):
        self.eps: list[list[int]] = []
        self.ranges: list[list[tuple]] = []

    def state(self) -> int:
        self.eps.append([])
        self.ranges.append([])
        return len(self.eps) - 1

    def emit(self, node) -> tuple[int, list[int]]:
        """Returns (start, accept_states) — fresh states per call."""
        kind = node[0]
        if kind == "ranges":
            s, a = self.state(), self.state()
            for lo, hi in node[1]:
                self.ranges[s].append((lo, hi, a))
            return s, [a]
        if kind == "string":
            s = self.state()
            cur = s
            for ch in node[1]:
                nxt = self.state()
                self.ranges[cur].append((ord(ch), ord(ch), nxt))
                cur = nxt
            return s, [cur]
        if kind == "concat":
            s1, a1 = self.emit(node[1])
            s2, a2 = self.emit(node[2])
            for a in a1:
                self.eps[a].append(s2)
            return s1, a2
        if kind == "union":
            s = self.state()
            s1, a1 = self.emit(node[1])
            s2, a2 = self.emit(node[2])
            self.eps[s] += [s1, s2]
            return s, a1 + a2
        if kind == "opt":
            s, a = self.emit(node[1])
            end = self.state()
            self.eps[s].append(end)
            for x in a:
                self.eps[x].append(end)
            return s, [end]
        if kind == "star":
            hub = self.state()
            s, a = self.emit(node[1])
            self.eps[hub].append(s)
            for x in a:
                self.eps[x].append(hub)
            return hub, [hub]
        if kind == "repeat":
            _, inner, n, m = node
            if m is None:  # {n,} = n copies + star
                parts = [inner] * n + [("star", inner)]
            else:  # {n,m} = n copies + (m-n) optionals
                parts = [inner] * n + [("opt", inner)] * (m - n)
            if not parts:
                return self.emit(("string", ""))
            e = parts[0]
            for p in parts[1:]:
                e = ("concat", e, p)
            return self.emit(e)
        if kind == "empty_lang":
            return self.state(), []  # no accept: matches nothing
        if kind == "anystring":
            hub = self.state()
            self.ranges[hub].append((0, MAX_CP, hub))
            return hub, [hub]
        if kind == "interval":
            return self.emit(_interval_ast(node[1], node[2], node[3]))
        if kind == "inter":
            return self._emit_product(node[1], node[2])
        raise AssertionError(kind)

    def _emit_product(self, left, right) -> tuple[int, list[int]]:
        """'&' intersection: determinize both sides standalone, embed the
        product DFA's states/transitions into this arena."""
        d1 = _compile_dfa(left)
        d2 = _compile_dfa(right)
        ids: dict[tuple, int] = {}
        accepts: list[int] = []

        def sid(p, q):
            if (p, q) not in ids:
                ids[(p, q)] = self.state()
                if d1.accept[p] and d2.accept[q]:
                    accepts.append(ids[(p, q)])
            return ids[(p, q)]

        start = sid(0, 0)
        work = [(0, 0)]
        seen = {(0, 0)}
        while work:
            p, q = work.pop()
            cur = ids[(p, q)]
            for lo1, hi1, t1 in d1.trans[p]:
                for lo2, hi2, t2 in d2.trans[q]:
                    lo, hi = max(lo1, lo2), min(hi1, hi2)
                    if lo > hi:
                        continue
                    dst = sid(t1, t2)
                    self.ranges[cur].append((lo, hi, dst))
                    if (t1, t2) not in seen:
                        seen.add((t1, t2))
                        work.append((t1, t2))
        return start, accepts


def _interval_ast(imin: int, imax: int, digits: int):
    """Automata.makeDecimalInterval: decimal strings with value in
    [imin, imax]. digits > 0 = exactly that many (zero-padded) digits;
    digits == 0 = any number of leading zeros before the significant
    part."""

    def tight(lo_s: str, hi_s: str):
        # fixed-length digit string in [lo_s, hi_s]: (tight_low,
        # tight_high) per-position NFA expressed as an AST union of the
        # classic three-way split — emitted recursively
        if not lo_s:
            return ("string", "")
        lo_d, hi_d = int(lo_s[0]), int(hi_s[0])
        opts = []
        if lo_d == hi_d:
            return ("concat", ("string", lo_s[0]), tight(lo_s[1:], hi_s[1:]))
        # first digit == lo_d: rest >= lo_rest
        opts.append(("concat", ("string", lo_s[0]),
                     tight(lo_s[1:], "9" * (len(lo_s) - 1))))
        # first digit == hi_d: rest <= hi_rest
        opts.append(("concat", ("string", hi_s[0]),
                     tight("0" * (len(hi_s) - 1), hi_s[1:])))
        if hi_d - lo_d > 1:
            mid = ("ranges", [(ord(str(lo_d + 1)), ord(str(hi_d - 1)))])
            free = ("repeat", ("ranges", [(ord("0"), ord("9"))]),
                    len(lo_s) - 1, len(lo_s) - 1)
            opts.append(("concat", mid, free))
        e = opts[0]
        for o in opts[1:]:
            e = ("union", e, o)
        return e

    if digits > 0:
        lo_s, hi_s = str(imin).zfill(digits), str(imax).zfill(digits)
        if len(hi_s) > digits:
            raise ValueError("interval bound wider than digit count")
        return tight(lo_s, hi_s)
    # variable length: optional leading zeros, then a no-leading-zero
    # significant part per length
    parts = []
    for ln in range(len(str(max(imin, 1))), len(str(max(imax, 1))) + 1):
        lo_l = max(imin, 0 if ln == 1 else 10 ** (ln - 1))
        hi_l = min(imax, 10 ** ln - 1)
        if lo_l > hi_l:
            continue
        parts.append(tight(str(lo_l).zfill(ln), str(hi_l).zfill(ln)))
    if not parts:
        return ("empty_lang",)
    e = parts[0]
    for p in parts[1:]:
        e = ("union", e, p)
    return ("concat", ("star", ("string", "0")), e)


def _compile_dfa(ast) -> CharDFA:
    arena = _Arena()
    root = arena.state()  # state 0 = _determinize's start
    start, accepts = arena.emit(ast)
    arena.eps[root].append(start)
    return _determinize(
        len(arena.eps), arena.eps, arena.ranges, set(accepts)
    )


def regexp_dfa(pattern: str) -> CharDFA:
    """Compile a Lucene RegExp to a CharDFA (RegExp.toAutomaton)."""
    return _compile_dfa(_Parser(pattern).parse())
