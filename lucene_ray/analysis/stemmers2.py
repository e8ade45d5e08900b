"""Second-wave light stemmers — Bulgarian, Czech, Indonesian, Latvian —
re-expressed in Python from the reference sources as spec:

  bg/BulgarianStemmer.java:25-135  bulgarian_stem (Nakov light stemmer:
                                   article + plural + ending rules with
                                   in-place rewrites)
  cz/CzechStemmer.java:30-155      czech_stem (Dolamic/Savoy light:
                                   case -> possessive -> normalize)
  id/IndonesianStemmer.java:30-270 indonesian_stem (Asian/Williams/Tahaghoghi
                                   stemmer: particle/possessive strip then
                                   flag-gated derivational prefix/suffix)
  lv/LatvianStemmer.java:25-180    latvian_stem (Karlis Kreslins light:
                                   vowel-count-guarded affix table +
                                   unpalatalization)

All operate on the char-buffer + live-length discipline of the Java
sources (truncated chars stay in the buffer so "add back" rules restore
them verbatim). Golden tests parse the reference's own Test*.java
checkOneTerm vectors at test time (tests/test_lang2.py). Per-UNIQUE-term
via lightstem.light_stem_terms.
"""

from __future__ import annotations

__all__ = [
    "serbian_fold",
    "bulgarian_stem",
    "czech_stem",
    "indonesian_stem",
    "latvian_stem",
]


def _ew(s: list, n: int, suffix: str) -> bool:
    k = len(suffix)
    return k <= n and "".join(s[n - k : n]) == suffix


# ---------------------------------------------------------------- Bulgarian


def _bg_remove_article(s: list, n: int) -> int:
    if n > 6 and _ew(s, n, "ият"):
        return n - 3
    if n > 5 and (
        _ew(s, n, "ът")
        or _ew(s, n, "то")
        or _ew(s, n, "те")
        or _ew(s, n, "та")
        or _ew(s, n, "ия")
    ):
        return n - 2
    if n > 4 and _ew(s, n, "ят"):
        return n - 2
    return n


def _bg_remove_plural(s: list, n: int) -> int:
    if n > 6:
        if _ew(s, n, "овци"):
            return n - 3  # leaves -о
        if _ew(s, n, "ове"):
            return n - 3
        if _ew(s, n, "еве"):
            s[n - 3] = "й"
            return n - 2
    if n > 5:
        if _ew(s, n, "ища"):
            return n - 3
        if _ew(s, n, "та"):
            return n - 2
        if _ew(s, n, "ци"):
            s[n - 2] = "к"
            return n - 1
        if _ew(s, n, "зи"):
            s[n - 2] = "г"
            return n - 1
        if s[n - 3] == "е" and s[n - 1] == "и":
            s[n - 3] = "я"  # replace е with я, drop и
            return n - 1
    if n > 4:
        if _ew(s, n, "си"):
            s[n - 2] = "х"
            return n - 1
        if _ew(s, n, "и"):
            return n - 1
    return n


def bulgarian_stem(token: str) -> str:
    s = list(token)
    n = len(s)
    if n < 4:
        return token
    if n > 5 and _ew(s, n, "ища"):
        return "".join(s[: n - 3])
    n = _bg_remove_article(s, n)
    n = _bg_remove_plural(s, n)
    if n > 3:
        if _ew(s, n, "я"):
            n -= 1
        if _ew(s, n, "а") or _ew(s, n, "о") or _ew(s, n, "е"):
            n -= 1
    # ен -> н (the paper's duplicated rule, fixed as in the perl impl)
    if n > 4 and _ew(s, n, "ен"):
        s[n - 2] = "н"
        n -= 1
    if n > 5 and s[n - 2] == "ъ":
        s[n - 2] = s[n - 1]  # replace ъN with N
        n -= 1
    return "".join(s[:n])


# -------------------------------------------------------------------- Czech

_CZ_CASE_5 = (
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete", "ěti",
    "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata", "aty", "ých",
    "ama", "ami", "ové", "ovi", "ými",
)
_CZ_CASE_4 = (
    "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou",
)
_CZ_VOWELS = frozenset("aeiouůyáéíýě")


def _cz_remove_case(s: list, n: int) -> int:
    if n > 7 and _ew(s, n, "atech"):
        return n - 5
    if n > 6 and (_ew(s, n, "ětem") or _ew(s, n, "etem") or _ew(s, n, "atům")):
        return n - 4
    if n > 5 and any(_ew(s, n, x) for x in _CZ_CASE_5):
        return n - 3
    if n > 4 and any(_ew(s, n, x) for x in _CZ_CASE_4):
        return n - 2
    if n > 3 and s[n - 1] in _CZ_VOWELS:
        return n - 1
    return n


def _cz_remove_possessives(s: list, n: int) -> int:
    if n > 5 and (_ew(s, n, "ov") or _ew(s, n, "in") or _ew(s, n, "ův")):
        return n - 2
    return n


def _cz_normalize(s: list, n: int) -> int:
    if _ew(s, n, "čt"):
        s[n - 2], s[n - 1] = "c", "k"
        return n
    if _ew(s, n, "št"):
        s[n - 2], s[n - 1] = "s", "k"
        return n
    if s[n - 1] in ("c", "č"):
        s[n - 1] = "k"
        return n
    if s[n - 1] in ("z", "ž"):
        s[n - 1] = "h"
        return n
    if n > 1 and s[n - 2] == "e":
        s[n - 2] = s[n - 1]  # e* > *
        return n - 1
    if n > 2 and s[n - 2] == "ů":
        s[n - 2] = "o"
        return n
    return n


def czech_stem(token: str) -> str:
    s = list(token)
    n = len(s)
    n = _cz_remove_case(s, n)
    n = _cz_remove_possessives(s, n)
    if n > 0:
        n = _cz_normalize(s, n)
    return "".join(s[:n])


# --------------------------------------------------------------- Indonesian

_ID_VOWELS = frozenset("aeiou")

_REMOVED_KE = 1
_REMOVED_PENG = 2
_REMOVED_DI = 4
_REMOVED_MENG = 8
_REMOVED_TER = 16
_REMOVED_BER = 32
_REMOVED_PE = 64


class _IdState:
    __slots__ = ("syllables", "flags")

    def __init__(self, token: str):
        self.syllables = sum(1 for c in token if c in _ID_VOWELS)
        self.flags = 0


def _id_remove_particle(st, t: str) -> str:
    if t.endswith(("kah", "lah", "pun")):
        st.syllables -= 1
        return t[:-3]
    return t


def _id_remove_possessive(st, t: str) -> str:
    if t.endswith(("ku", "mu")):
        st.syllables -= 1
        return t[:-2]
    if t.endswith("nya"):
        st.syllables -= 1
        return t[:-3]
    return t


def _id_first_order_prefix(st, t: str) -> str:
    # (prefix, flag, chars-cut, rewrite-char-at) rules in source order;
    # meny/peny/pen rewrites follow the Java deleteN + in-place poke.
    if t.startswith("meng"):
        st.flags |= _REMOVED_MENG
        st.syllables -= 1
        return t[4:]
    if t.startswith("meny") and len(t) > 4 and t[4] in _ID_VOWELS:
        st.flags |= _REMOVED_MENG
        st.syllables -= 1
        return "s" + t[4:]
    if t.startswith("men"):
        st.flags |= _REMOVED_MENG
        st.syllables -= 1
        return t[3:]
    if t.startswith("mem"):
        st.flags |= _REMOVED_MENG
        st.syllables -= 1
        return t[3:]
    if t.startswith("me"):
        st.flags |= _REMOVED_MENG
        st.syllables -= 1
        return t[2:]
    if t.startswith("peng"):
        st.flags |= _REMOVED_PENG
        st.syllables -= 1
        return t[4:]
    if t.startswith("peny") and len(t) > 4 and t[4] in _ID_VOWELS:
        st.flags |= _REMOVED_PENG
        st.syllables -= 1
        return "s" + t[4:]
    if t.startswith("peny"):
        st.flags |= _REMOVED_PENG
        st.syllables -= 1
        return t[4:]
    if t.startswith("pen") and len(t) > 3 and t[3] in _ID_VOWELS:
        st.flags |= _REMOVED_PENG
        st.syllables -= 1
        return "t" + t[3:]
    if t.startswith("pen"):
        st.flags |= _REMOVED_PENG
        st.syllables -= 1
        return t[3:]
    if t.startswith("pem"):
        st.flags |= _REMOVED_PENG
        st.syllables -= 1
        return t[3:]
    if t.startswith("di"):
        st.flags |= _REMOVED_DI
        st.syllables -= 1
        return t[2:]
    if t.startswith("ter"):
        st.flags |= _REMOVED_TER
        st.syllables -= 1
        return t[3:]
    if t.startswith("ke"):
        st.flags |= _REMOVED_KE
        st.syllables -= 1
        return t[2:]
    return t


def _id_second_order_prefix(st, t: str) -> str:
    if t.startswith("ber"):
        st.flags |= _REMOVED_BER
        st.syllables -= 1
        return t[3:]
    if t == "belajar":
        st.flags |= _REMOVED_BER
        st.syllables -= 1
        return t[3:]
    if (
        t.startswith("be")
        and len(t) > 4
        and t[2] not in _ID_VOWELS
        and t[3] == "e"
        and t[4] == "r"
    ):
        st.flags |= _REMOVED_BER
        st.syllables -= 1
        return t[2:]
    if t.startswith("per"):
        st.syllables -= 1
        return t[3:]
    if t == "pelajar":
        st.syllables -= 1
        return t[3:]
    if t.startswith("pe"):
        st.flags |= _REMOVED_PE
        st.syllables -= 1
        return t[2:]
    return t


def _id_remove_suffix(st, t: str) -> str:
    if (
        t.endswith("kan")
        and not st.flags & _REMOVED_KE
        and not st.flags & _REMOVED_PENG
        and not st.flags & _REMOVED_PE
    ):
        st.syllables -= 1
        return t[:-3]
    if (
        t.endswith("an")
        and not st.flags & _REMOVED_DI
        and not st.flags & _REMOVED_MENG
        and not st.flags & _REMOVED_TER
    ):
        st.syllables -= 1
        return t[:-2]
    if (
        t.endswith("i")
        and not t.endswith("si")
        and not st.flags & _REMOVED_BER
        and not st.flags & _REMOVED_KE
        and not st.flags & _REMOVED_PENG
    ):
        st.syllables -= 1
        return t[:-1]
    return t


def indonesian_stem(token: str, stem_derivational: bool = True) -> str:
    st = _IdState(token)
    t = token
    if st.syllables > 2:
        t = _id_remove_particle(st, t)
    if st.syllables > 2:
        t = _id_remove_possessive(st, t)
    if stem_derivational:
        old = len(t)
        if st.syllables > 2:
            t = _id_first_order_prefix(st, t)
        if old != len(t):  # a first-order rule fired
            old = len(t)
            if st.syllables > 2:
                t = _id_remove_suffix(st, t)
            if old != len(t):  # a suffix rule fired
                if st.syllables > 2:
                    t = _id_second_order_prefix(st, t)
        else:
            if st.syllables > 2:
                t = _id_second_order_prefix(st, t)
            if st.syllables > 2:
                t = _id_remove_suffix(st, t)
    return t


# ------------------------------------------------------------------ Latvian

# (affix, vowel-count guard, fires palatalization) in source order
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(s: list, n: int) -> int:
    # s[n] is the first removed char: -u affixes gate the first two rules
    if s[n] == "u":
        if _ew(s, n, "kš"):
            # kš -> kst (extends one back into the removed region)
            n += 1
            s[n - 2], s[n - 1] = "s", "t"
            return n
        if _ew(s, n, "ņņ"):
            s[n - 2], s[n - 1] = "n", "n"
            return n
    if _ew(s, n, "pj") or _ew(s, n, "bj") or _ew(s, n, "mj") or _ew(s, n, "vj"):
        return n - 1  # labial consonant
    if _ew(s, n, "šņ"):
        s[n - 2], s[n - 1] = "s", "n"
        return n
    if _ew(s, n, "žņ"):
        s[n - 2], s[n - 1] = "z", "n"
        return n
    if _ew(s, n, "šļ"):
        s[n - 2], s[n - 1] = "s", "l"
        return n
    if _ew(s, n, "žļ"):
        s[n - 2], s[n - 1] = "z", "l"
        return n
    if _ew(s, n, "ļņ"):
        s[n - 2], s[n - 1] = "l", "n"
        return n
    if _ew(s, n, "ļļ"):
        s[n - 2], s[n - 1] = "l", "l"
        return n
    if s[n - 1] == "č":
        s[n - 1] = "c"
        return n
    if s[n - 1] == "ļ":
        s[n - 1] = "l"
        return n
    if s[n - 1] == "ņ":
        s[n - 1] = "n"
        return n
    return n


def latvian_stem(token: str) -> str:
    s = list(token)
    n = len(s)
    vowels = sum(1 for c in s[:n] if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if vowels > vc and n >= len(affix) + 3 and _ew(s, n, affix):
            n -= len(affix)
            if palatalizes:
                n = _lv_unpalatalize(s, n)
            return "".join(s[:n])
    return token


# ------------------------------------------------------------------ Serbian

# sr/SerbianNormalizationFilter.java:30-170 — Cyrillic -> "bald" Latin
# fold; ђ/đ, љ, њ, џ expand to digraphs, š/ž/č/ć fold to bare ASCII.
_SR_MAP = str.maketrans(
    {
        "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
        "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j", "к": "k",
        "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
        "с": "s", "т": "t", "ћ": "c", "ц": "c", "ч": "c", "č": "c",
        "ć": "c", "у": "u", "ф": "f", "х": "h", "ш": "s", "š": "s",
        "ђ": "dj", "đ": "dj", "љ": "lj", "њ": "nj", "џ": "dz",
    }
)


def serbian_fold(token: str) -> str:
    return token.translate(_SR_MAP)
