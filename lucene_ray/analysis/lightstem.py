"""Light stemmers for German / French / Spanish — the published Savoy
(UniNE / CLEF-2001) algorithms as implemented by the reference:
analysis/common/.../de/GermanLightStemmer.java:62-140,
fr/FrenchLightStemmer.java:63-256, es/SpanishLightStemmer.java:60-114
(those files are the spec; this is an original Python re-expression).
These cover §2.2's "other languages" row with the light family; the full
Snowball/ICU library stays out of scope.

Stemming is per-UNIQUE-term (dictionary-encode -> stem vocab -> gather),
same vectorization contract as the Porter path (analysis/porter.py
stem_terms). No SQL oracle (DuckDB has no stemmers offline) — golden
tests mirror the reference's TestFrenchLightStemFilter cases plus
spec-derived German/Spanish pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "german_light_stem",
    "french_light_stem",
    "spanish_light_stem",
    "light_stem_terms",
]

# ------------------------------------------------------------------ German

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST = set("bdfghklmnt")  # stEnding consonants


def german_normalize(token: str) -> str:
    """de/GermanNormalizationFilter.java:30-80 — the snowball German2
    folding FSM: umlauts fold to base vowels, ß -> ss, and 'e' deletes
    after a [aou]-then-not-blocked sequence (the U state); i/q/y and a
    folded umlaut block the next 'u' from entering the umlaut state.
    Runs AFTER the stop filter and BEFORE the light stemmer in the
    reference GermanAnalyzer chain (GermanAnalyzer.java:131-136)."""
    N, V, U = 0, 1, 2
    state = N
    out = []
    for c in token:
        if c in ("a", "o"):
            state = U
        elif c == "u":
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue  # delete the e
            state = V
        elif c in ("i", "q", "y"):
            state = V
        elif c == "ä":
            c = "a"
            state = V
        elif c == "ö":
            c = "o"
            state = V
        elif c == "ü":
            c = "u"
            state = V
        elif c == "ß":
            out.append("s")
            c = "s"
            state = N
        else:
            state = N
        out.append(c)
    return "".join(out)


def german_light_stem(token: str) -> str:
    """GermanLightStemmer.stem (de/GermanLightStemmer.java:62)."""
    s = token.translate(_DE_FOLD)
    ln = len(s)
    # step1
    if ln > 5 and s.endswith("ern"):
        ln -= 3
    elif ln > 4 and ln >= 2 and s[ln - 2] == "e" and s[ln - 1] in "mnrs":
        ln -= 2
    elif ln > 3 and s[ln - 1] == "e":
        ln -= 1
    elif ln > 3 and s[ln - 1] == "s" and s[ln - 2] in _DE_ST:
        ln -= 1
    # step2
    if ln > 5 and s[ln - 3 : ln] == "est":
        ln -= 3
    elif ln > 4 and s[ln - 2] == "e" and s[ln - 1] in "rn":
        ln -= 2
    elif ln > 4 and s[ln - 2 : ln] == "st" and s[ln - 3] in _DE_ST:
        ln -= 2
    return s[:ln]


# ----------------------------------------------------------------- Spanish

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(token: str) -> str:
    """SpanishLightStemmer.stem (es/SpanishLightStemmer.java:60)."""
    if len(token) < 5:
        return token
    s = list(token.translate(_ES_FOLD))
    ln = len(s)
    last = s[ln - 1]
    if last in ("o", "a", "e"):
        return "".join(s[: ln - 1])
    if last == "s":
        if s[ln - 2] == "e" and s[ln - 3] == "s" and s[ln - 4] == "e":
            return "".join(s[: ln - 2])
        if s[ln - 2] == "e" and s[ln - 3] == "c":
            s[ln - 3] = "z"
            return "".join(s[: ln - 2])
        if s[ln - 2] in ("o", "a", "e"):
            return "".join(s[: ln - 2])
    return "".join(s)


# ------------------------------------------------------------------ French

_FR_FOLD = {
    "à": "a", "á": "a", "â": "a",
    "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u",
    "î": "i",
    "ç": "c",
}


def _fr_norm(s: list, ln: int) -> str:
    """FrenchLightStemmer.norm (fr/FrenchLightStemmer.java:210-255)."""
    if ln > 4:
        for i in range(ln):
            s[i] = _FR_FOLD.get(s[i], s[i])
        # collapse consecutive duplicate letters
        out = [s[0]]
        for i in range(1, ln):
            if s[i] == out[-1] and s[i].isalpha():
                continue
            out.append(s[i])
        s = out
        ln = len(s)
    if ln > 4 and s[ln - 2] == "i" and s[ln - 1] == "e":
        ln -= 2
    if ln > 4:
        if s[ln - 1] == "r":
            ln -= 1
        if s[ln - 1] == "e":
            ln -= 1
        if s[ln - 1] == "e":
            ln -= 1
        if s[ln - 1] == s[ln - 2] and s[ln - 1].isalpha():
            ln -= 1
    return "".join(s[:ln])


def _ends(s: list, ln: int, suffix: str) -> bool:
    return ln >= len(suffix) and "".join(s[ln - len(suffix) : ln]) == suffix


def french_light_stem(token: str) -> str:
    """FrenchLightStemmer.stem (fr/FrenchLightStemmer.java:63-208) —
    branch order and fall-through behavior preserved exactly."""
    s = list(token)
    ln = len(s)
    if ln > 5 and s[ln - 1] == "x":
        if s[ln - 3] == "a" and s[ln - 2] == "u" and s[ln - 4] != "e":
            s[ln - 2] = "l"
        ln -= 1
    if ln > 3 and s[ln - 1] == "x":
        ln -= 1
    if ln > 3 and s[ln - 1] == "s":
        ln -= 1
    if ln > 9 and _ends(s, ln, "issement"):
        ln -= 6
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 8 and _ends(s, ln, "issant"):
        ln -= 4
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 6 and _ends(s, ln, "ement"):
        ln -= 4
        if ln > 3 and _ends(s, ln, "ive"):
            ln -= 1
            s[ln - 1] = "f"
        return _fr_norm(s, ln)
    if ln > 11 and _ends(s, ln, "ficatrice"):
        ln -= 5
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 10 and _ends(s, ln, "ficateur"):
        ln -= 4
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 9 and _ends(s, ln, "catrice"):
        ln -= 3
        s[ln - 4] = "q"
        s[ln - 3] = "u"
        s[ln - 2] = "e"
        return _fr_norm(s, ln)
    if ln > 8 and _ends(s, ln, "cateur"):
        ln -= 2
        s[ln - 4] = "q"
        s[ln - 3] = "u"
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 8 and _ends(s, ln, "atrice"):
        ln -= 4
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 7 and _ends(s, ln, "ateur"):
        ln -= 3
        s[ln - 2] = "e"
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 6 and _ends(s, ln, "trice"):
        ln -= 1
        s[ln - 3] = "e"
        s[ln - 2] = "u"
        s[ln - 1] = "r"
        # no return: falls through (java:140-146)
    if ln > 5 and _ends(s, ln, "ième"):
        return _fr_norm(s, ln - 4)
    if ln > 7 and _ends(s, ln, "teuse"):
        ln -= 2
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 6 and _ends(s, ln, "teur"):
        ln -= 1
        s[ln - 1] = "r"
        return _fr_norm(s, ln)
    if ln > 5 and _ends(s, ln, "euse"):
        return _fr_norm(s, ln - 2)
    if ln > 8 and _ends(s, ln, "ère"):
        ln -= 1
        s[ln - 2] = "e"
        return _fr_norm(s, ln)
    if ln > 7 and _ends(s, ln, "ive"):
        ln -= 1
        s[ln - 1] = "f"
        return _fr_norm(s, ln)
    if ln > 4 and (_ends(s, ln, "folle") or _ends(s, ln, "molle")):
        ln -= 2
        s[ln - 1] = "u"
        return _fr_norm(s, ln)
    if ln > 9 and _ends(s, ln, "nnelle"):
        return _fr_norm(s, ln - 5)
    if ln > 9 and _ends(s, ln, "nnel"):
        return _fr_norm(s, ln - 3)
    if ln > 4 and _ends(s, ln, "ète"):
        ln -= 1
        s[ln - 2] = "e"
        # no return: falls through (java:184-187)
    if ln > 8 and _ends(s, ln, "ique"):
        ln -= 4
        # no return: falls through (java:189)
    if ln > 8 and _ends(s, ln, "esse"):
        return _fr_norm(s, ln - 3)
    if ln > 7 and _ends(s, ln, "inage"):
        return _fr_norm(s, ln - 3)
    if ln > 9 and _ends(s, ln, "isation"):
        ln -= 7
        if ln > 5 and _ends(s, ln, "ual"):
            s[ln - 2] = "e"
        return _fr_norm(s, ln)
    if ln > 9 and _ends(s, ln, "isateur"):
        return _fr_norm(s, ln - 7)
    if ln > 8 and _ends(s, ln, "ation"):
        return _fr_norm(s, ln - 5)
    if ln > 8 and _ends(s, ln, "ition"):
        return _fr_norm(s, ln - 5)
    return _fr_norm(s, ln)


# ------------------------------------------------------------ vectorization

def _more_stemmers():
    from lucene_ray.analysis import arabic
    from lucene_ray.analysis import greek
    from lucene_ray.analysis import indic
    from lucene_ray.analysis import rslp
    from lucene_ray.analysis import stemmers as st
    from lucene_ray.analysis import stemmers2 as st2

    return {
        "scandinavian_normalization": __import__(
            "lucene_ray.analysis.scandinavian", fromlist=["x"]
        ).scandinavian_normalize,
        "scandinavian_folding": __import__(
            "lucene_ray.analysis.scandinavian", fromlist=["x"]
        ).scandinavian_fold,
        "german_light_chain": (
            lambda t: german_light_stem(german_normalize(t))
        ),
        "arabic_pre": indic.decimal_digit_fold,
        "arabic": arabic.arabic_stem_chain,
        "persian_norm": arabic.persian_normalize_chain,
        "persian": arabic.persian_stem,
        "greek_norm": greek.greek_fold,
        "greek": greek.greek_stem,
        "serbian_fold": st2.serbian_fold,
        "bulgarian": st2.bulgarian_stem,
        "czech": st2.czech_stem,
        "indonesian": st2.indonesian_stem,
        "latvian": st2.latvian_stem,
        "hindi_norm": indic.hindi_normalize_chain,
        "hindi": indic.hindi_stem,
        "bengali_norm": indic.bengali_normalize_chain,
        "bengali": indic.bengali_stem,
        "portuguese_rslp": rslp.portuguese_stem,
        "portuguese_minimal": rslp.portuguese_minimal_stem,
        "galician": rslp.galician_stem,
        "galician_minimal": rslp.galician_minimal_stem,
        "sorani_norm": st.sorani_normalize,
        "sorani": st.sorani_stem,
        "italian_light": st.italian_light_stem,
        "portuguese_light": st.portuguese_light_stem,
        "russian_light": st.russian_light_stem,
        "finnish_light": st.finnish_light_stem,
        "hungarian_light": st.hungarian_light_stem,
        "swedish_light": st.swedish_light_stem,
        "german_minimal": st.german_minimal_stem,
        "french_minimal": st.french_minimal_stem,
        "spanish_plural": st.spanish_plural_stem,
        "english_minimal": st.english_minimal_stem,
        "english_possessive": st.english_possessive,
        "swedish_minimal": st.swedish_minimal_stem,
        "norwegian_light": st.norwegian_light_stem,
        "norwegian_minimal": st.norwegian_minimal_stem,
        "nynorsk_light": lambda t: st.norwegian_light_stem(t, st.NO_NYNORSK),
        "nynorsk_minimal": (
            lambda t: st.norwegian_minimal_stem(t, st.NO_NYNORSK)
        ),
    }


_STEMMERS = {
    "german_light": german_light_stem,
    "french_light": french_light_stem,
    "spanish_light": spanish_light_stem,
}
_STEMMERS.update(_more_stemmers())


def light_stem_terms(terms: pa.Array, language: str) -> pa.Array:
    """Stem a token array with one python stem per UNIQUE term (dictionary
    encode -> stem vocab -> gather), the porter.stem_terms contract."""
    fn = _STEMMERS[language]
    d = (
        terms.dictionary_encode()
        if not isinstance(terms, pa.DictionaryArray)
        else terms
    )
    vocab = d.dictionary.to_pylist()
    stemmed = [fn(t) for t in vocab]
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.array(stemmed, dtype=object)[idx]
    return pa.array(out.tolist(), type=pa.string())
