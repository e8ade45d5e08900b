"""Arabic-script analysis — Arabic and Persian normalizers/stemmers,
re-expressed in Python from the reference sources as spec:

  ar/ArabicNormalizer.java:30-80   arabic_normalize (hamza/alef folding,
                                   teh marbuta -> heh, tatweel + the 8
                                   tashkeel diacritics deleted)
  ar/ArabicStemmer.java:30-115     arabic_stem (light10: first-match
                                   prefix strip with per-prefix length
                                   guards, CASCADE suffix strip)
  fa/PersianNormalizer.java:30-70  persian_normalize (farsi yeh/keheh/heh
                                   variants folded, hamza-above deleted)
  fa/PersianStemmer.java:30-75     persian_stem (cascade suffix strip)

Chain order differs per language (the reference comments call it out):
ArabicAnalyzer stops on the UNNORMALIZED token stream (stop list is raw)
then normalizes+stems; PersianAnalyzer normalizes first (stop list is in
normalized form) and its PersianCharFilter turns ZWNJ into a separator
BEFORE tokenization. Golden tests parse the reference's own Test*.java
vectors at test time (tests/test_arabic.py) — no SQL oracle (DuckDB has
no Arabic analysis). All functions run per-UNIQUE-term via
lightstem.light_stem_terms.
"""

from __future__ import annotations

__all__ = [
    "arabic_normalize",
    "arabic_stem",
    "arabic_stem_chain",
    "persian_normalize",
    "persian_stem",
    "persian_normalize_chain",
]

_AR_ALEF = "ا"
_AR_DELETE = frozenset(
    "ـ"  # tatweel
    "ًٌٍ"  # fathatan/dammatan/kasratan
    "َُِ"  # fatha/damma/kasra
    "ّْ"  # shadda/sukun
)
_AR_MAP = {
    "آ": _AR_ALEF,  # alef madda
    "أ": _AR_ALEF,  # alef hamza above
    "إ": _AR_ALEF,  # alef hamza below
    "ى": "ي",  # dotless yeh -> yeh
    "ة": "ه",  # teh marbuta -> heh
}


def arabic_normalize(token: str) -> str:
    out = []
    for ch in token:
        if ch in _AR_DELETE:
            continue
        out.append(_AR_MAP.get(ch, ch))
    return "".join(out)


# ArabicStemmer prefix table (order matters — first match wins). The
# length guards are startsWithCheckLength: the 1-char "و" prefix needs
# len >= 4; every other prefix needs len >= len(prefix) + 2.
_AR_PREFIXES = (
    "ال",  # al-
    "وال",  # wal-
    "بال",  # bal-
    "كال",  # kal-
    "فال",  # fal-
    "لل",  # ll-
    "و",  # wa-
)

# Suffix table — CASCADE: every matching suffix strips in declaration
# order (endsWithCheckLength: len >= len(suffix) + 2 at each step).
_AR_SUFFIXES = (
    "ها",  # -ha
    "ان",  # -an
    "ات",  # -at
    "ون",  # -wn
    "ين",  # -yn
    "يه",  # -yh
    "ية",  # -yp
    "ه",  # -h
    "ة",  # -p
    "ي",  # -y
)


def arabic_stem(token: str) -> str:
    n = len(token)
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if n < 4:
                continue
        elif n < len(p) + 2:
            continue
        if token.startswith(p):
            token = token[len(p) :]
            n = len(token)
            break
    for sfx in _AR_SUFFIXES:
        if n >= len(sfx) + 2 and token.endswith(sfx):
            token = token[: n - len(sfx)]
            n = len(token)
    return token


def arabic_stem_chain(token: str) -> str:
    """ar/ArabicAnalyzer.java:131-142 post-stop chain:
    ArabicNormalizationFilter -> ArabicStemFilter."""
    return arabic_stem(arabic_normalize(token))


_FA_YEH = "ي"
_FA_HEH = "ه"
_FA_MAP = {
    "ی": _FA_YEH,  # farsi yeh
    "ے": _FA_YEH,  # yeh barree
    "ک": "ك",  # keheh -> kaf
    "ۀ": _FA_HEH,  # heh + yeh above
    "ہ": _FA_HEH,  # heh goal
}


def persian_normalize(token: str) -> str:
    out = []
    for ch in token:
        if ch == "ٔ":  # hamza above: delete
            continue
        out.append(_FA_MAP.get(ch, ch))
    return "".join(out)


# PersianStemmer suffixes — CASCADE in declaration order, each needs
# len >= len(suffix) + 2 at its step. The trailing ZWNJ entry matters
# only for the standalone filter (the analyzer's char filter already
# turned ZWNJ into a separator).
_FA_SUFFIXES = (
    "ات",  # -at
    "ان",  # -an
    "ترين",  # -tarin
    "تر",  # -tar
    "يي",  # -ii
    "ي",  # -i
    "ها",  # -ha
    "‌",  # ZWNJ
)


def persian_stem(token: str) -> str:
    n = len(token)
    for sfx in _FA_SUFFIXES:
        if n >= len(sfx) + 2 and token.endswith(sfx):
            token = token[: n - len(sfx)]
            n = len(token)
    return token


def persian_normalize_chain(token: str) -> str:
    """fa/PersianAnalyzer.java:128-139 pre-stop chain: DecimalDigitFilter
    -> ArabicNormalizationFilter -> PersianNormalizationFilter (the stop
    list is in this normalized form)."""
    from lucene_ray.analysis.indic import decimal_digit_fold

    return persian_normalize(arabic_normalize(decimal_digit_fold(token)))
