"""Scandinavian interchange filters — analysis/miscellaneous/
ScandinavianNormalizationFilter.java (+ ScandinavianNormalizer.java) and
ScandinavianFoldingFilter.java, implemented as token->token scalar scans
that mirror the reference's single left-to-right in-place pass exactly
(digraph consumption order matters: 'aaa' -> 'åa', not 'aå').

Normalization (less destructive): ä->æ, Ä->Æ, ö->ø, Ö->Ø; digraphs
aa/aA/ao/aO -> å, ae/aE -> æ, oe/oE/oo/oO -> ø (ALL_FOLDINGS set).
Folding (more destructive): å/ä/æ -> a, Å/Ä/Æ -> A, ø/ö -> o, Ø/Ö -> O;
digraphs a[aAeEoO] -> a, o[eEoO] -> o (second char deleted).

Chains register as 'scandinavian_normalization' / 'scandinavian_folding'
(Unicode tokenizer, no stop set). No SQL oracle: the sequential digraph
scan is not RE2-chain-expressible in general (a later rule must not see
an earlier rule's rewrite) — golden tests pin the reference Javadoc
equivalence classes (blåbærsyltetøj / räksmörgås families)."""

from __future__ import annotations

_N_SINGLE = {"ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø"}


def scandinavian_normalize(token: str) -> str:
    out = []
    i, n = 0, len(token)
    while i < n:
        c = token[i]
        if c in _N_SINGLE:
            out.append(_N_SINGLE[c])
            i += 1
            continue
        nxt = token[i + 1] if i + 1 < n else ""
        if c == "a" and nxt in ("a", "A", "o", "O"):
            out.append("å")
            i += 2
        elif c == "A" and nxt in ("a", "A", "o", "O"):
            out.append("Å")
            i += 2
        elif c == "a" and nxt in ("e", "E"):
            out.append("æ")
            i += 2
        elif c == "A" and nxt in ("e", "E"):
            out.append("Æ")
            i += 2
        elif c == "o" and nxt in ("e", "E", "o", "O"):
            out.append("ø")
            i += 2
        elif c == "O" and nxt in ("e", "E", "o", "O"):
            out.append("Ø")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def scandinavian_fold(token: str) -> str:
    out = []
    i, n = 0, len(token)
    while i < n:
        c = token[i]
        if c in ("å", "ä", "æ"):
            out.append("a")
            i += 1
            continue
        if c in ("Å", "Ä", "Æ"):
            out.append("A")
            i += 1
            continue
        if c in ("ø", "ö"):
            out.append("o")
            i += 1
            continue
        if c in ("Ø", "Ö"):
            out.append("O")
            i += 1
            continue
        nxt = token[i + 1] if i + 1 < n else ""
        if c in ("a", "A") and nxt in ("a", "A", "e", "E", "o", "O"):
            out.append(c)
            i += 2
        elif c in ("o", "O") and nxt in ("e", "E", "o", "O"):
            out.append(c)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)
