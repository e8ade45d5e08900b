"""Phonetic matching — the analysis/phonetic module's PhoneticFilter
(analysis/phonetic/src/java/.../PhoneticFilter.java) with the two classic
commons-codec encoders implemented from their published algorithms:

- ``soundex``: American Soundex with commons-codec's H/W rule (letters
  separated by H or W code once — the NARA "Ashcraft -> A261" rule);
- ``metaphone``: Lawrence Philips' 1990 Metaphone (maxCodeLen 4, the
  commons-codec default).

Both are pinned by the reference module's own TestPhoneticFilter vectors
plus the algorithms' canonical published examples (tests/test_phonetic.py);
commons-codec quirk parity beyond those vectors is not claimed
(DoubleMetaphone/BeiderMorse/Caverphone stay out of scope, documented).

PhoneticFilter semantics mirrored exactly (PhoneticFilter.java:57-99):
encode each token; empty or identical encodings pass the token through;
``inject=True`` (the factory default) emits the PHONETIC form first at
the original position and the original as a posInc==0 twin —
``has_overlaps`` analyzers, so norms discount the twins; inject=False
replaces the token.
"""

from __future__ import annotations

from functools import lru_cache

_SOUNDEX_MAP = {}
for _letters, _digit in (
    ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
    ("L", "4"), ("MN", "5"), ("R", "6"),
):
    for _c in _letters:
        _SOUNDEX_MAP[_c] = _digit
for _c in "AEIOUYHW":
    _SOUNDEX_MAP[_c] = "0"

_VOWELS = frozenset("AEIOU")


def _clean(term: str) -> str:
    return "".join(c for c in term.upper() if "A" <= c <= "Z")


@lru_cache(maxsize=65536)
def soundex(term: str) -> str:
    """American Soundex, commons-codec US_ENGLISH semantics: first letter
    + 3 digits; vowels reset the run, H/W are transparent (a consonant
    with the same code as the one BEFORE an H/W is silent)."""
    s = _clean(term)
    if not s:
        return ""
    out = [s[0]]
    last = _SOUNDEX_MAP[s[0]]
    for i in range(1, len(s)):
        c = s[i]
        mapped = _SOUNDEX_MAP[c]
        if mapped != "0" and i > 1 and s[i - 1] in "HW":
            pre = s[i - 2]
            if _SOUNDEX_MAP[pre] == mapped or pre in "HW":
                mapped = "0"  # silent across the H/W (Ashcraft rule)
        if mapped != "0" and mapped != last:
            out.append(mapped)
            if len(out) == 4:
                break
        last = mapped
    return "".join(out) + "0" * (4 - len(out))


@lru_cache(maxsize=65536)
def metaphone(term: str, max_code_len: int = 4) -> str:
    """Philips' Metaphone (the commons-codec default encoder)."""
    s = _clean(term)
    n = len(s)
    if n == 0:
        return ""
    if n == 1:
        return s
    # initial-letter transforms
    if s[:2] in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif s[0] == "X":
        s = "S" + s[1:]
    elif s[:2] == "WH":
        s = "W" + s[2:]
    n = len(s)
    code: list[str] = []
    i = 0
    while len(code) < max_code_len and i < n:
        c = s[i]
        nxt = s[i + 1] if i + 1 < n else ""
        nxt2 = s[i + 2] if i + 2 < n else ""
        prev = s[i - 1] if i > 0 else ""
        if c != "C" and prev == c:
            i += 1
            continue  # duplicate letters collapse (except C)
        if c in _VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                code.append("B")  # -MB is silent
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                code.append("X")  # -CIA-
            elif nxt in ("I", "E", "Y"):
                code.append("S")
            elif nxt == "H":
                # -SCH- hardens; otherwise CH = X
                code.append("K" if prev == "S" else "X")
            else:
                code.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in ("I", "E", "Y"):
                code.append("J")  # -DGE/DGI/DGY
                i += 2
            else:
                code.append("T")
        elif c == "F":
            code.append("F")
        elif c == "G":
            silent = False
            if nxt == "H" and not (i + 2 < n and nxt2 in _VOWELS):
                silent = True  # GH not followed by a vowel
            if nxt == "N" and (i + 1 == n - 1 or s[i + 1:i + 4] == "NED"):
                silent = True  # GN$ / GNED$
            if prev == "D" and nxt in ("I", "E", "Y"):
                silent = True  # handled by the D rule
            if not silent:
                code.append("J" if nxt in ("I", "E", "Y") else "K")
        elif c == "H":
            if prev in ("C", "S", "P", "T", "G") or (prev in _VOWELS and nxt not in _VOWELS):
                pass  # silent (digraph partner / trailing breath)
            else:
                code.append("H")
        elif c == "J":
            code.append("J")
        elif c == "K":
            if prev != "C":
                code.append("K")
        elif c in "LMNR":
            code.append(c)
        elif c == "P":
            code.append("F" if nxt == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if nxt == "H" or (nxt == "I" and nxt2 in ("A", "O")):
                code.append("X")  # SH / SIO / SIA
            else:
                code.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("A", "O"):
                code.append("X")  # TIA / TIO
            elif nxt == "H":
                code.append("0")  # theta
            elif not (nxt == "C" and nxt2 == "H"):
                code.append("T")  # TCH is silent
        elif c == "V":
            code.append("F")
        elif c == "W":
            if nxt in _VOWELS:
                code.append("W")
        elif c == "X":
            code.append("K")
            if len(code) < max_code_len:
                code.append("S")
        elif c == "Y":
            if nxt in _VOWELS:
                code.append("Y")
        elif c == "Z":
            code.append("S")
        i += 1
    return "".join(code)


# commons-codec RefinedSoundex US_ENGLISH mapping (A..Z)
_REFINED_MAP = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                        "01360240043788015936020505"))


@lru_cache(maxsize=65536)
def refined_soundex(term: str) -> str:
    """RefinedSoundex (commons-codec): first letter + the code of EVERY
    letter (vowels included as 0), adjacent duplicate codes collapsed; no
    length cap, no zero-padding."""
    s = _clean(term)
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        code = _REFINED_MAP[c]
        if code != last:
            out.append(code)
            last = code
    return "".join(out)


ENCODERS = {
    "soundex": soundex,
    "metaphone": metaphone,
    "refined_soundex": refined_soundex,
}


def encode_terms(terms, encoder: str):
    """Arrow token array -> encoded codes ('' when the code equals the
    term or is empty — PhoneticFilter's no-op signal), unique-value work."""
    import numpy as np
    import pyarrow as pa

    enc = ENCODERS[encoder]
    d = (
        terms.dictionary_encode()
        if not isinstance(terms, pa.DictionaryArray)
        else terms
    )
    vocab = d.dictionary.to_pylist()
    codes = []
    for t in vocab:
        try:
            v = enc(t)
        except Exception:
            v = ""
        codes.append(v if v and v != t else "")
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.array(codes, dtype=object)[idx]
    return pa.array(out.tolist(), type=pa.string())
