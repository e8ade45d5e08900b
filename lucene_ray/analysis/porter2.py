"""Porter2 ("English") Snowball stemmer — implemented from the published
algorithm description (M.F. Porter, snowballstem.org/algorithms/english/
stemmer.html), the algorithm behind the reference's SnowballPorterFilter
with EnglishStemmer (analysis/common/.../snowball/SnowballPorterFilterFactory
.java + the generated tartarus EnglishStemmer). Original Python
re-expression from the spec, not a port of the generated Java.

Vectorization stance: per-UNIQUE-term (dictionary-encode -> stem vocab ->
gather), the analyzer module's vocab-not-postings cost rule — identical to
analysis/porter.py stem_terms.

No SQL oracle (DuckDB's stem() needs the offline-unavailable fts
extension): golden tests carry the spec's own rule examples plus structural
properties (tests/test_porter2.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

# special-case stems applied before the steps (spec "exceptional forms")
_EXCEPTIONS = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# stop after step 1a (spec "exceptional forms after step 1a")
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)


def _mark_ys(w: str) -> str:
    """y at the start or after a vowel is consonantal: mark as 'Y'
    (the marked string's vowel set is then exactly 'aeiouy' lowercase)."""
    if "y" not in w:
        return w
    out = list(w)
    if out[0] == "y":
        out[0] = "Y"
    for i in range(1, len(out)):
        if out[i] == "y" and out[i - 1] in "aeiou":
            out[i] = "Y"
    return "".join(out)


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets. R1 = after the first non-vowel following a
    vowel (with the gener-/commun-/arsen- prefix exception); R2 = the same
    rule applied within R1."""
    n = len(w)

    def r_from(start: int) -> int:
        i = start
        # find a vowel
        while i < n and w[i] not in "aeiouy":
            i += 1
        # then a non-vowel
        while i < n and w[i] in "aeiouy":
            i += 1
        return i + 1 if i < n else n

    r1 = n
    for pfx in ("gener", "commun", "arsen"):
        if w.startswith(pfx):
            r1 = len(pfx)
            break
    else:
        r1 = r_from(0)
    r2 = r_from(r1)
    return r1, r2


def _is_short_syllable(w: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive): either (v at word
    start)(non-vowel), or (non-vowel)(v)(non-vowel not w/x/Y)."""
    if i == 1:
        return w[0] in "aeiouy" and w[1] not in "aeiouy"
    if i >= 2:
        return (
            w[i - 1] in "aeiouy"
            and w[i] not in "aeiouy"
            and w[i] not in "wxY"
            and w[i - 2] not in "aeiouy"
        )
    return False


def _is_short_word(w: str, r1: int) -> bool:
    return r1 >= len(w) and _is_short_syllable(w, len(w) - 1)


def _has_vowel(w: str, end: int) -> bool:
    return any(c in "aeiouy" for c in w[:end])


def porter2_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    w = _mark_ys(w)

    # step 0: longest of ' / 's / 's'
    for sfx in ("'s'", "'s", "'"):
        if w.endswith(sfx):
            w = w[: -len(sfx)]
            break
    r1, r2 = _regions(w)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _has_vowel(w, len(w) - 2):
        w = w[:-1]

    if w.replace("Y", "y") in _EXCEPTIONS_1A:
        return w.replace("Y", "y")

    # step 1b
    ed_like = None
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    else:
        for sfx in ("ingly", "edly", "ing", "ed"):
            if w.endswith(sfx):
                stem = w[: -len(sfx)]
                if _has_vowel(stem, len(stem)):
                    ed_like = stem
                break
    if ed_like is not None:
        w = ed_like
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif w.endswith(_DOUBLES):
            w = w[:-1]
        else:
            r1, _ = _regions(w)
            if _is_short_word(w, r1):
                w += "e"
    r1, r2 = _regions(w)

    # step 1c: y/Y -> i when preceded by a non-vowel that is not word-initial
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in "aeiouy"
    ):
        w = w[:-1] + "i"

    # step 2 (suffix found must lie in R1); longest match wins (the tuples
    # are ordered longest-first and matching stops at the first hit)
    _STEP2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"), ("bli", "ble"),
        ("ogi", None), ("li", None),
    )
    for sfx, rep in _STEP2:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= r1:
                if sfx == "ogi":
                    if len(w) >= 4 and w[-4] == "l":
                        w = w[:-1]  # ogi -> og
                elif sfx == "li":
                    if len(w) >= 3 and w[-3] in _LI_VALID:
                        w = w[:-2]
                else:
                    w = w[: -len(sfx)] + rep
            break
    r1, r2 = _regions(w)

    # step 3 (in R1; ative needs R2)
    _STEP3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for sfx, rep in _STEP3:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= r1:
                if sfx == "ative":
                    if len(w) - 5 >= r2:
                        w = w[:-5]
                else:
                    w = w[: -len(sfx)] + rep
            break
    r1, r2 = _regions(w)

    # step 4 (in R2)
    _STEP4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    )
    for sfx in _STEP4:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= r2:
                if sfx == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(sfx)]
            break
    r1, r2 = _regions(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _is_short_syllable(w, len(w) - 2)
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


def porter2_stem_terms(terms: pa.Array) -> pa.Array:
    """Stem a token column per UNIQUE term (dictionary encode -> python
    stem over the vocab -> gather), mirroring porter.stem_terms."""
    if len(terms) == 0:
        return terms
    enc = terms.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    stemmed = pa.array([porter2_stem(t) for t in vocab], type=pa.string())
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return stemmed.take(pa.array(idx))
