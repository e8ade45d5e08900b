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

import re
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


_CAVERPHONE_STARTS = (
    ("cough", "cou2f"), ("rough", "rou2f"), ("tough", "tou2f"),
    ("enough", "enou2f"), ("trough", "trou2f"), ("gn", "2n"),
)
# ordered replacement table — order is part of the published spec
_CAVERPHONE_STEP6 = (
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"), ("tch", "2ch"),
    ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"), ("dg", "2g"),
    ("tio", "sio"), ("tia", "sia"), ("d", "t"), ("ph", "fh"), ("b", "p"),
    ("sh", "s2"), ("z", "s"),
)


@lru_cache(maxsize=65536)
def caverphone2(term: str) -> str:
    """Caverphone 2.0 (David Hood, University of Otago CTP150804, 2004 —
    the published revised spec, the encoder behind commons-codec
    Caverphone2 that the reference's PhoneticFilter factory exposes).
    Returns the fixed 10-character key, or '' for empty input. Pinned by
    TestPhoneticFilter's Darda/Karleen/Datha/Carlene -> TTA1111111 /
    KLN1111111 vectors plus spec-derived examples."""
    s = "".join(c for c in term.lower() if "a" <= c <= "z")
    if not s:
        return ""
    if s.endswith("e"):
        s = s[:-1]
    for pre, rep in _CAVERPHONE_STARTS:
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    if s.endswith("mb"):
        s = s[:-2] + "m2"
    for pat, rep in _CAVERPHONE_STEP6:
        s = s.replace(pat, rep)
    # vowels: initial -> A, medial -> 3
    if s and s[0] in "aeiou":
        s = "A" + s[1:]
    s = "".join("3" if c in "aeiou" else c for c in s)
    s = s.replace("j", "y")
    if s.startswith("y3"):
        s = "Y3" + s[2:]
    elif s.startswith("y"):
        s = "A" + s[1:]
    s = s.replace("y", "3")
    s = s.replace("3gh3", "3kh3").replace("gh", "22").replace("g", "k")
    for c in "stpkfmn":
        s = re.sub(c + "+", c.upper(), s)
    s = s.replace("w3", "W3").replace("wh3", "Wh3")
    if s.endswith("w"):
        s = s[:-1] + "3"
    s = s.replace("w", "2")
    if s.startswith("h"):
        s = "A" + s[1:]
    s = s.replace("h", "2")
    s = s.replace("r3", "R3")
    if s.endswith("r"):
        s = s[:-1] + "3"
    s = s.replace("r", "2")
    s = s.replace("l3", "L3")
    if s.endswith("l"):
        s = s[:-1] + "3"
    s = s.replace("l", "2")
    s = s.replace("2", "")
    if s.endswith("3"):
        s = s[:-1] + "A"
    s = s.replace("3", "")
    return (s + "1111111111")[:10]


_NYSIIS_VOWELS = frozenset("AEIOU")


def _nysiis_transcode(prev: str, curr: str, nxt: str, anext: str) -> str:
    """One remaining-character transcode (Taft 1970 rules, commons-codec
    ordering): returns the chars written back over positions i.. of the
    working buffer."""
    if curr == "E" and nxt == "V":
        return "AF"
    if curr in _NYSIIS_VOWELS:
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anext == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (prev not in _NYSIIS_VOWELS or nxt not in _NYSIIS_VOWELS):
        return prev
    if curr == "W" and prev in _NYSIIS_VOWELS:
        return "A"
    return curr


@lru_cache(maxsize=65536)
def nysiis(term: str, strict: bool = True) -> str:
    """NYSIIS (Robert Taft, New York State Identification and Intelligence
    System, 1970 — the published algorithm behind commons-codec Nysiis).
    ``strict`` (the reference factory default) truncates the key to 6.
    Pinned by TestPhoneticFilter's aaa/bbb/ccc/easgasg -> A/B/C/EASGAS."""
    s = "".join(c for c in term.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    # first-characters translation
    if s.startswith("MAC"):
        s = "MCC" + s[3:]
    elif s.startswith("KN"):
        s = "NN" + s[2:]
    elif s.startswith("K"):
        s = "C" + s[1:]
    elif s.startswith("PH") or s.startswith("PF"):
        s = "FF" + s[2:]
    elif s.startswith("SCH"):
        s = "SSS" + s[3:]
    # last-characters translation
    if s.endswith("EE") or s.endswith("IE"):
        s = s[:-2] + "Y"
    elif s[-2:] in ("DT", "RT", "RD", "NT", "ND"):
        s = s[:-2] + "D"
    chars = list(s)
    key = [chars[0]]
    n = len(chars)
    for i in range(1, n):
        nxt = chars[i + 1] if i < n - 1 else " "
        anext = chars[i + 2] if i < n - 2 else " "
        transcoded = _nysiis_transcode(chars[i - 1], chars[i], nxt, anext)
        # write back so later prev/next see transcoded values
        for j, tc in enumerate(transcoded):
            if i + j < n:
                chars[i + j] = tc
        if chars[i] != key[-1]:
            key.append(chars[i])
    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if len(key) > 1 and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


ENCODERS = {
    "soundex": soundex,
    "metaphone": metaphone,
    "refined_soundex": refined_soundex,
    "caverphone2": caverphone2,
    "nysiis": nysiis,
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


def _double_metaphone_codes(term: str) -> list[str]:
    """DoubleMetaphoneFilter.incrementToken's emission set
    (DoubleMetaphoneFilter.java:50-100): primary if non-empty and != the
    term; alternate additionally only if != primary."""
    from lucene_ray.analysis.dmetaphone import double_metaphone

    primary, alternate = double_metaphone(term)
    codes: list[str] = []
    if primary and primary != term:
        codes.append(primary)
        if alternate and alternate != primary:
            codes.append(alternate)
    return codes


def _dm_soundex_codes(term: str) -> list[str]:
    from lucene_ray.analysis.dmsoundex import dm_soundex

    return list(dm_soundex(term))


# term -> ordered code list (possibly empty = pass-through)
MULTI_ENCODERS = {
    "double_metaphone": _double_metaphone_codes,
    "dm_soundex": _dm_soundex_codes,
}


def encode_multi_vocab(vocab: list[str], encoder: str) -> list[list[str]]:
    """Per-vocab-entry ordered code lists (unique-value work — callers
    dictionary-encode the token stream first)."""
    enc = MULTI_ENCODERS[encoder]
    out: list[list[str]] = []
    for t in vocab:
        try:
            out.append(enc(t))
        except Exception:
            out.append([])
    return out
