"""Daitch–Mokotoff Soundex — the published D-M coding chart (Daitch &
Mokotoff, Avotaynu 1985; the standard genealogy table) with branching
alternatives, behind the reference's
analysis/phonetic/src/java/.../DaitchMokotoffSoundexFilter.java.

``dm_soundex(value)`` returns the list of 6-digit codes in BRANCH ORDER
(fork order of the alternatives, first-occurrence dedup) — the exact
token order the reference filter emits, pinned by its own test vectors
(TestDaitchMokotoffSoundexFilter.java: ccc -> 400000 450000 454000
540000 545000 500000, easgasg -> 045450).

Semantics implemented from the published chart:
- longest pattern match at each position, per-pattern (start-of-word /
  before-a-vowel / other) code contexts;
- adjacent identical codes collapse UNLESS separated by a vowel — realised
  by tracking each branch's last replacement (a vowel's empty 'other'
  replacement resets it, so codes around a vowel are kept twice);
- branching alternatives (c, ch, ck, j, rz/rs) fork every live branch in
  rule order; duplicate codes keep their first position;
- codes are truncated/padded to 6 digits.

ASCII letters only (accents should be folded upstream — the repo's
FoldingAnalyzer table; documented divergence from commons-codec's
in-table accent handling). Branch count is capped at 32 (a word needs 5+
consecutive ambiguous letters to hit it; the cap keeps the per-token work
bounded and is far above any natural name).
"""

from __future__ import annotations

from functools import lru_cache

_NC = ""  # not coded

# pattern -> list of (start, before_vowel, other) alternatives.
# Multiple alternatives = the chart's ambiguous sounds (branching).
_RULES_FLAT: list[tuple[str, list[tuple[str, str, str]]]] = [
    ("ai", [("0", "1", _NC)]), ("aj", [("0", "1", _NC)]),
    ("ay", [("0", "1", _NC)]), ("au", [("0", "7", _NC)]),
    ("a", [("0", _NC, _NC)]),
    ("b", [("7", "7", "7")]),
    ("chs", [("5", "54", "54")]),
    # alternative ORDER: the reference's ccc vector pins c's fork order
    # (all-4 branch first); ch shares the same tch/kh ambiguity so it
    # follows suit. ck/rz/j orders are unpinned — they change token order
    # only, never the code set (documented).
    ("ch", [("4", "4", "4"), ("5", "5", "5")]),
    ("ck", [("5", "5", "5"), ("45", "45", "45")]),
    ("cz", [("4", "4", "4")]), ("cs", [("4", "4", "4")]),
    ("csz", [("4", "4", "4")]), ("czs", [("4", "4", "4")]),
    ("c", [("4", "4", "4"), ("5", "5", "5")]),
    ("drz", [("4", "4", "4")]), ("drs", [("4", "4", "4")]),
    ("ds", [("4", "4", "4")]), ("dsh", [("4", "4", "4")]),
    ("dsz", [("4", "4", "4")]),
    ("dz", [("4", "4", "4")]), ("dzh", [("4", "4", "4")]),
    ("dzs", [("4", "4", "4")]),
    ("d", [("3", "3", "3")]), ("dt", [("3", "3", "3")]),
    ("ei", [("0", "1", _NC)]), ("ej", [("0", "1", _NC)]),
    ("ey", [("0", "1", _NC)]), ("eu", [("1", "1", _NC)]),
    ("e", [("0", _NC, _NC)]),
    ("fb", [("7", "7", "7")]), ("f", [("7", "7", "7")]),
    ("g", [("5", "5", "5")]),
    ("h", [("5", "5", _NC)]),
    ("ia", [("1", _NC, _NC)]), ("ie", [("1", _NC, _NC)]),
    ("io", [("1", _NC, _NC)]), ("iu", [("1", _NC, _NC)]),
    ("i", [("0", _NC, _NC)]),
    ("j", [("1", _NC, _NC), ("4", "4", "4")]),
    ("ks", [("5", "54", "54")]), ("kh", [("5", "5", "5")]),
    ("k", [("5", "5", "5")]),
    ("l", [("8", "8", "8")]),
    ("mn", [("66", "66", "66")]), ("m", [("6", "6", "6")]),
    ("nm", [("66", "66", "66")]), ("n", [("6", "6", "6")]),
    ("oi", [("0", "1", _NC)]), ("oj", [("0", "1", _NC)]),
    ("oy", [("0", "1", _NC)]), ("o", [("0", _NC, _NC)]),
    ("p", [("7", "7", "7")]), ("pf", [("7", "7", "7")]),
    ("ph", [("7", "7", "7")]),
    ("q", [("5", "5", "5")]),
    ("rz", [("94", "94", "94"), ("4", "4", "4")]),
    ("rs", [("94", "94", "94"), ("4", "4", "4")]),
    ("r", [("9", "9", "9")]),
    ("schtsch", [("2", "4", "4")]), ("schtsh", [("2", "4", "4")]),
    ("schtch", [("2", "4", "4")]),
    ("sch", [("4", "4", "4")]),
    ("schd", [("2", "43", "43")]), ("scht", [("2", "43", "43")]),
    ("sh", [("4", "4", "4")]),
    ("shch", [("2", "4", "4")]), ("shtch", [("2", "4", "4")]),
    ("shtsh", [("2", "4", "4")]),
    ("sht", [("2", "43", "43")]), ("shd", [("2", "43", "43")]),
    ("stch", [("2", "4", "4")]), ("stsch", [("2", "4", "4")]),
    ("sc", [("2", "4", "4")]),
    ("strz", [("2", "4", "4")]), ("strs", [("2", "4", "4")]),
    ("stsh", [("2", "4", "4")]),
    ("st", [("2", "43", "43")]),
    ("szcz", [("2", "4", "4")]), ("szcs", [("2", "4", "4")]),
    ("szt", [("2", "43", "43")]), ("szd", [("2", "43", "43")]),
    ("sz", [("4", "4", "4")]),
    ("sd", [("2", "43", "43")]),
    ("s", [("4", "4", "4")]),
    ("tch", [("4", "4", "4")]), ("ttch", [("4", "4", "4")]),
    ("ttsch", [("4", "4", "4")]),
    ("th", [("3", "3", "3")]),
    ("trz", [("4", "4", "4")]), ("trs", [("4", "4", "4")]),
    ("tsch", [("4", "4", "4")]), ("tsh", [("4", "4", "4")]),
    ("ts", [("4", "4", "4")]), ("tts", [("4", "4", "4")]),
    ("ttsz", [("4", "4", "4")]), ("tc", [("4", "4", "4")]),
    ("tz", [("4", "4", "4")]), ("ttz", [("4", "4", "4")]),
    ("tzs", [("4", "4", "4")]), ("tsz", [("4", "4", "4")]),
    ("t", [("3", "3", "3")]),
    ("ui", [("0", "1", _NC)]), ("uj", [("0", "1", _NC)]),
    ("uy", [("0", "1", _NC)]), ("ue", [("0", _NC, _NC)]),
    ("u", [("0", _NC, _NC)]),
    ("v", [("7", "7", "7")]), ("w", [("7", "7", "7")]),
    ("x", [("5", "54", "54")]),
    ("y", [("1", _NC, _NC)]),
    ("zdz", [("2", "4", "4")]), ("zdzh", [("2", "4", "4")]),
    ("zhdzh", [("2", "4", "4")]),
    ("zd", [("2", "43", "43")]), ("zhd", [("2", "43", "43")]),
    ("zh", [("4", "4", "4")]), ("zs", [("4", "4", "4")]),
    ("zsch", [("4", "4", "4")]), ("zsh", [("4", "4", "4")]),
    ("z", [("4", "4", "4")]),
]

# first letter -> patterns sorted longest-first (longest match wins)
_RULES: dict[str, list[tuple[str, list[tuple[str, str, str]]]]] = {}
for _pat, _alts in _RULES_FLAT:
    _RULES.setdefault(_pat[0], []).append((_pat, _alts))
for _lst in _RULES.values():
    _lst.sort(key=lambda r: -len(r[0]))

# "The letters A, E, I, O, U, J, and Y are always considered vowels"
# (the published chart's context rule).
_DM_VOWELS = frozenset("aeioujy")

_CODE_LEN = 6
_MAX_BRANCHES = 32


@lru_cache(maxsize=65536)
def dm_soundex(term: str) -> tuple[str, ...]:
    """All D-M codes for ``term`` in branch order (first-occurrence dedup),
    each padded/truncated to 6 digits; empty tuple for empty input."""
    s = "".join(c for c in term.lower() if "a" <= c <= "z")
    if not s:
        return ()
    n = len(s)
    # branch = (code_digits, last_replacement)
    branches: list[tuple[str, str]] = [("", "")]
    i = 0
    while i < n:
        group = _RULES.get(s[i])
        rule = None
        if group is not None:
            for pat, alts in group:
                if s.startswith(pat, i):
                    rule = (pat, alts)
                    break
        if rule is None:
            i += 1
            continue
        pat, alts = rule
        end = i + len(pat)
        if i == 0:
            ctx = 0  # start of word
        elif end < n and s[end] in _DM_VOWELS:
            ctx = 1  # before a vowel
        else:
            ctx = 2
        nxt: list[tuple[str, str]] = []
        seen: set[tuple[str, str]] = set()
        for code, last in branches:
            for alt in alts:
                rep = alt[ctx]
                # collapse adjacent identical codes; a vowel's empty
                # replacement resets `last`, so vowel-separated repeats
                # are coded twice (the chart's repeat rule)
                if rep and not (last and last.endswith(rep)):
                    new = ((code + rep)[:_CODE_LEN], rep)
                else:
                    new = (code, rep)
                if new not in seen:
                    seen.add(new)
                    nxt.append(new)
                if len(nxt) >= _MAX_BRANCHES:
                    break
            if len(nxt) >= _MAX_BRANCHES:
                break
        branches = nxt
        i = end
    out: list[str] = []
    emitted: set[str] = set()
    for code, _ in branches:
        padded = (code + "000000")[:_CODE_LEN]
        if padded not in emitted:
            emitted.add(padded)
            out.append(padded)
    return tuple(out)
