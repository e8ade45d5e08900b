"""RSLP stemmer engine + the four reference stemmers built on it
(pt/RSLPStemmerBase.java is the spec; rule data in rslp_rules.py):

  portuguese_stem          pt/PortugueseStemmer.java:45-75 step flow
                           (plural→adverb→feminine→augmentative→noun;
                           verb only if noun removed nothing; vowel only
                           if verb removed nothing; then accent fold)
  portuguese_minimal_stem  pt/PortugueseMinimalStemmer.java (Plural only)
  galician_stem            gl/GalicianStemmer.java:45-80 (plural→
                           unification→adverb→augmentative LOOP→noun;
                           verb only on no-noun; vowel ALWAYS; fold)
  galician_minimal_stem    gl/GalicianMinimalStemmer.java (Plural only)

Rule semantics (RSLPStemmerBase.java:96-208): a rule matches when the
word ends with the suffix and the stem left after removal is >= min
chars; exceptions are whole-word (step flag 1, case-sensitive set) or
ends-with patterns (flag 0); the first matching rule in a step fires and
the step ends. A step is skipped when the word is shorter than the step
min (0 = derived from the rules) or ends with none of the step's
condition suffixes.

Validated token-for-token against the reference's bundled vocabularies
(ptrslp.txt 20K pairs, ptminimal.txt, gl.txt — tests/test_rslp.py).
"""

from __future__ import annotations

import re

from lucene_ray.analysis.rslp_rules import GALICIAN_RSLP, PORTUGUESE_RSLP

_HEADER_RE = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP_RE = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP_RE = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC_RE = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


class _Rule:
    __slots__ = ("suffix", "min", "replacement", "exc_set", "exc_suffixes")

    def __init__(self, suffix, min_, replacement, exc_set=None, exc_suffixes=None):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exc_set = exc_set
        self.exc_suffixes = exc_suffixes

    def matches(self, s: str) -> bool:
        if len(s) - len(self.suffix) < self.min or not s.endswith(self.suffix):
            return False
        if self.exc_set is not None and s in self.exc_set:
            return False
        if self.exc_suffixes is not None and s.endswith(self.exc_suffixes):
            return False
        return True

    def replace(self, s: str) -> str:
        return s[: len(s) - len(self.suffix)] + self.replacement


class _Step:
    __slots__ = ("name", "rules", "min", "suffixes")

    def __init__(self, name, rules, min_, suffixes):
        self.name = name
        self.rules = rules
        if min_ == 0:
            min_ = min(r.min + len(r.suffix) for r in rules)
        self.min = min_
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, s: str) -> str:
        if len(s) < self.min:
            return s
        if self.suffixes is not None and not s.endswith(self.suffixes):
            return s
        for r in self.rules:
            if r.matches(s):
                return r.replace(s)
        return s


def _parse_list(body: str) -> list[str]:
    return re.findall(r'"([^"]*)"', body)


def parse_rslp(text: str) -> dict[str, _Step]:
    """RSLPStemmerBase.parse — line-based: comments (#) and blanks
    skipped; a step header line, rule lines, terminated by ';'."""
    lines = []
    for raw in text.splitlines():
        ln = raw.split("#", 1)[0].strip() if "#" in raw else raw.strip()
        if ln:
            lines.append(ln)
    steps: dict[str, _Step] = {}
    i = 0
    while i < len(lines):
        m = _HEADER_RE.match(lines[i])
        if not m:
            raise ValueError(f"illegal RSLP step header: {lines[i]!r}")
        name, min_, type_ = m.group(1), int(m.group(2)), int(m.group(3))
        conds = _parse_list(m.group(4))
        rules: list[_Rule] = []
        i += 1
        while True:
            ln = lines[i]
            if (sm := _STRIP_RE.match(ln)) is not None:
                rules.append(_Rule(sm.group(1), int(sm.group(2)), ""))
            elif (rm := _REP_RE.match(ln)) is not None:
                rules.append(_Rule(rm.group(1), int(rm.group(2)), rm.group(3)))
            elif (em := _EXC_RE.match(ln)) is not None:
                exc = _parse_list(em.group(4))
                if type_ == 0:
                    rules.append(
                        _Rule(em.group(1), int(em.group(2)), em.group(3),
                              exc_suffixes=tuple(exc))
                    )
                else:
                    rules.append(
                        _Rule(em.group(1), int(em.group(2)), em.group(3),
                              exc_set=frozenset(exc))
                    )
            else:
                raise ValueError(f"illegal RSLP rule: {ln!r}")
            i += 1
            if ln.endswith(";"):
                break
        steps[name] = _Step(name, rules, min_, conds)
    return steps


_PT = parse_rslp(PORTUGUESE_RSLP)
_GL = parse_rslp(GALICIAN_RSLP)

_PT_FOLD = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûü", "aaaaaaceeeeiiiinooooouuuu"
)
_GL_FOLD = str.maketrans("áéêíóú", "aeeiou")


def portuguese_stem(token: str) -> str:
    """PortugueseStemmer.stem (pt/PortugueseStemmer.java:45)."""
    s = _PT["Plural"].apply(token)
    s = _PT["Adverb"].apply(s)
    s = _PT["Feminine"].apply(s)
    s = _PT["Augmentative"].apply(s)
    old = s
    s = _PT["Noun"].apply(s)
    if s == old:
        old = s
        s = _PT["Verb"].apply(s)
        if s == old:
            s = _PT["Vowel"].apply(s)
    return s.translate(_PT_FOLD)


def portuguese_minimal_stem(token: str) -> str:
    """PortugueseMinimalStemmer.stem (Plural step only)."""
    return _PT["Plural"].apply(token)


def galician_stem(token: str) -> str:
    """GalicianStemmer.stem (gl/GalicianStemmer.java:45)."""
    s = _GL["Plural"].apply(token)
    s = _GL["Unification"].apply(s)
    s = _GL["Adverb"].apply(s)
    while True:
        old = s
        s = _GL["Augmentative"].apply(s)
        if s == old:
            break
    old = s
    s = _GL["Noun"].apply(s)
    if s == old:
        s = _GL["Verb"].apply(s)
    s = _GL["Vowel"].apply(s)
    return s.translate(_GL_FOLD)


def galician_minimal_stem(token: str) -> str:
    """GalicianMinimalStemmer.stem (Plural step only)."""
    return _GL["Plural"].apply(token)
