"""Light / minimal / plural stemmers for six more languages — the
published UniNE (Savoy) light-stemming algorithms and the reference's
minimal variants, re-expressed in Python from the reference sources as
spec:

  it/ItalianLightStemmer.java:55-110       italian_light_stem
  pt/PortugueseLightStemmer.java:57-245    portuguese_light_stem
  ru/RussianLightStemmer.java:52-135       russian_light_stem
  fi/FinnishLightStemmer.java:53-233       finnish_light_stem
  hu/HungarianLightStemmer.java:52-243     hungarian_light_stem
  sv/SwedishLightStemmer.java:52-85        swedish_light_stem
  de/GermanMinimalStemmer.java:55-95       german_minimal_stem
  fr/FrenchMinimalStemmer.java:55-70       french_minimal_stem
  es/SpanishPluralStemmer.java:60-245      spanish_plural_stem
  no/NorwegianLightStemmer.java:60-182     norwegian_light_stem
  no/NorwegianMinimalStemmer.java:55-110   norwegian_minimal_stem

Every function is validated token-for-token against the reference's OWN
bundled vocabulary test data (analysis/common/src/test/.../{it,pt,ru,fi,
hu,sv,de,fr,es}/*testdata.zip — 8K-35K golden pairs per language) in
tests/test_stemmers.py. Same per-unique-term vectorization contract as
analysis/porter.py stem_terms; no SQL oracle (DuckDB has no stemmers
offline) — the zip goldens are the parity evidence.
"""

from __future__ import annotations

__all__ = [
    "italian_light_stem",
    "portuguese_light_stem",
    "russian_light_stem",
    "finnish_light_stem",
    "hungarian_light_stem",
    "swedish_light_stem",
    "german_minimal_stem",
    "french_minimal_stem",
    "spanish_plural_stem",
    "norwegian_light_stem",
    "norwegian_minimal_stem",
    "english_minimal_stem",
    "english_possessive",
    "swedish_minimal_stem",
    "NO_BOKMAAL",
    "NO_NYNORSK",
]


# ------------------------------------------------------------------ Italian

_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def italian_light_stem(token: str) -> str:
    """ItalianLightStemmer.stem (it/ItalianLightStemmer.java:55)."""
    if len(token) < 6:
        return token
    s = token.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last in "ao":
        return s[:-2] if prev == "i" else s[:-1]
    return s


# --------------------------------------------------------------- Portuguese

_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaooooo" "eeeeuuuuiiiic")


def _pt_remove_suffix(s: list[str]) -> list[str]:
    n = len(s)
    t = "".join(s)
    if n > 4 and t.endswith("es") and s[n - 3] in "rslz":
        return s[: n - 2]
    if n > 3 and t.endswith("ns"):
        s[n - 2] = "m"
        return s[: n - 1]
    if n > 4 and (t.endswith("eis") or t.endswith("éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and t.endswith("ais"):
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and t.endswith("óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and t.endswith("is"):
        s[n - 1] = "l"
        return s
    if n > 3 and (t.endswith("ões") or t.endswith("ães")):
        s = s[: n - 1]
        s[n - 3] = "ã"
        s[n - 2] = "o"
        return s
    if n > 6 and t.endswith("mente"):
        return s[: n - 5]
    if n > 3 and s[n - 1] == "s":
        return s[: n - 1]
    return s


def _pt_norm_feminine(s: list[str]) -> list[str]:
    n = len(s)
    t = "".join(s)
    if n > 7 and (
        t.endswith("inha") or t.endswith("iaca") or t.endswith("eira")
    ):
        s[n - 1] = "o"
        return s
    if n > 6:
        if (
            t.endswith("osa")
            or t.endswith("ica")
            or t.endswith("ida")
            or t.endswith("ada")
            or t.endswith("iva")
            or t.endswith("ama")
        ):
            s[n - 1] = "o"
            return s
        if t.endswith("ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return s[: n - 1]
        if t.endswith("ora"):
            return s[: n - 1]
        if t.endswith("esa"):
            s[n - 3] = "ê"
            return s[: n - 1]
        if t.endswith("na"):
            s[n - 1] = "o"
            return s
    return s


def portuguese_light_stem(token: str) -> str:
    """PortugueseLightStemmer.stem (pt/PortugueseLightStemmer.java:57)."""
    if len(token) < 4:
        return token
    s = list(token)
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s.pop()
    return "".join(s).translate(_PT_FOLD)


# ------------------------------------------------------------------ Russian

_RU_3 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему", "ери",
    "ими", "ого", "ому", "ыми", "оев",
)
_RU_2 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою", "ую",
    "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им", "ое", "ой",
    "ом", "ов", "ые", "ый", "ым", "ми",
)


def russian_light_stem(token: str) -> str:
    """RussianLightStemmer.stem (ru/RussianLightStemmer.java:52)."""
    s = token
    n = len(s)
    # removeCase
    if n > 6 and s.endswith(("иями", "оями")):
        s = s[: n - 4]
    elif n > 5 and s.endswith(_RU_3):
        s = s[: n - 3]
    elif n > 4 and s.endswith(_RU_2):
        s = s[: n - 2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[: n - 1]
    # normalize
    n = len(s)
    if n > 3:
        if s[-1] in "ьи":
            return s[: n - 1]
        if s[-1] == "н" and s[-2] == "н":
            return s[: n - 1]
    return s


# ------------------------------------------------------------------ Finnish

_FI_VOWELS = set("aeiouy")


def _fi_step1(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("kin"):
            return _fi_step1(s[: n - 3])
        if s.endswith("ko"):
            return _fi_step1(s[: n - 2])
    if n > 11:
        if s.endswith("dellinen"):
            return s[: n - 8]
        if s.endswith("dellisuus"):
            return s[: n - 9]
    return s


def _fi_step2(s: str) -> str:
    n = len(s)
    if n > 5:
        if s.endswith(("lla", "tse", "sti")):
            return s[: n - 3]
        if s.endswith("ni"):
            return s[: n - 2]
        if s.endswith("aa"):
            return s[: n - 1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[: n - 4] + "s"
        if s.endswith("ntena"):
            return s[: n - 5] + "s"
        if s.endswith("tten"):
            return s[: n - 4]
        if s.endswith("eiden"):
            return s[: n - 5]
    if n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            return s[: n - 4]
        if s[n - 3] == "h" and s[n - 2] in _FI_VOWELS and s[n - 1] == "n":
            return s[: n - 3]
        if s.endswith("den"):
            return s[: n - 3] + "s"
        if s.endswith("ksen"):
            return s[: n - 4] + "s"
        if s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return s[: n - 3]
    if n > 5:
        if s.endswith(("na", "ne")):
            return s[: n - 2]
        if s.endswith("nei"):
            return s[: n - 3]
    if n > 4:
        if s.endswith(("ja", "ta")):
            return s[: n - 2]
        if s[-1] == "a":
            return s[: n - 1]
        if s[-1] == "n" and s[n - 2] in _FI_VOWELS:
            return s[: n - 2]
        if s[-1] == "n":
            return s[: n - 1]
    return s


def _fi_norm1(s: str) -> str:
    n = len(s)
    if n > 5 and s.endswith("hde"):
        s = s[: n - 3] + "ksi"
    n = len(s)
    if n > 4 and s.endswith(("ei", "at")):
        return s[: n - 2]
    if n > 3 and s[-1] in "tsjeai":
        return s[: n - 1]
    return s


def _fi_norm2(s: str) -> str:
    n = len(s)
    if n > 8 and s[-1] in "eou":
        s = s[: n - 1]
        n -= 1
    if n > 4:
        if s[-1] == "i":
            s = s[: n - 1]
        if len(s) > 4:
            # collapse doubled k/p/t (StemmerUtil.delete loop)
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = "".join(out)
    return s


def finnish_light_stem(token: str) -> str:
    """FinnishLightStemmer.stem (fi/FinnishLightStemmer.java:53)."""
    if len(token) < 4:
        return token
    s = token.translate(str.maketrans("äåö", "aao"))
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))


# ---------------------------------------------------------------- Hungarian

_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = set("aeiouy")


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[: n - 4]
    if n > 5:
        if s.endswith(
            ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben", "bol",
             "nal", "nel", "hoz", "hez", "tol")
        ):
            return s[: n - 3]
        if s.endswith(("al", "el")):
            if s[n - 3] not in _HU_VOWELS and s[n - 3] == s[n - 4]:
                return s[: n - 3]
    if n > 4:
        if s.endswith(
            ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")
        ):
            return s[: n - 2]
        if s.endswith(("on", "en")) and s[n - 3] not in _HU_VOWELS:
            return s[: n - 2]
        if s[-1] in "tn":
            return s[: n - 1]
        if s[-1] in "ae" and s[n - 2] == s[n - 3] and s[n - 2] not in _HU_VOWELS:
            return s[: n - 2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[n - 5] not in _HU_VOWELS and s.endswith(("atok", "otok", "etek")):
            return s[: n - 4]
        if s.endswith(("itek", "itok")):
            return s[: n - 4]
    if n > 5:
        if s[n - 4] not in _HU_VOWELS and s.endswith(("unk", "tok", "tek")):
            return s[: n - 3]
        if s[n - 4] in _HU_VOWELS and s.endswith("juk"):
            return s[: n - 3]
        if s.endswith("ink"):
            return s[: n - 3]
    if n > 4:
        if s[n - 3] not in _HU_VOWELS and s.endswith(
            ("am", "em", "om", "ad", "ed", "od", "uk")
        ):
            return s[: n - 2]
        if s[n - 3] in _HU_VOWELS and s.endswith(("nk", "ja", "je")):
            return s[: n - 2]
        if s.endswith(("im", "id", "ik")):
            return s[: n - 2]
    if n > 3:
        if s[-1] in "ae" and s[n - 2] not in _HU_VOWELS:
            return s[: n - 1]
        if s[-1] in "md" and s[n - 2] in _HU_VOWELS:
            return s[: n - 1]
        if s[-1] == "i":
            return s[: n - 1]
    return s


def _hu_remove_plural(s: str) -> str:
    n = len(s)
    if n > 3 and s[-1] == "k":
        if s[n - 2] in "aoe" and n > 4:
            return s[: n - 2]
        return s[: n - 1]
    return s


def hungarian_light_stem(token: str) -> str:
    """HungarianLightStemmer.stem (hu/HungarianLightStemmer.java:52)."""
    s = token.translate(_HU_FOLD)
    s = _hu_remove_plural(_hu_remove_possessive(_hu_remove_case(s)))
    if len(s) > 3 and s[-1] in "aeio":
        s = s[:-1]
    return s


# ------------------------------------------------------------------ Swedish


def swedish_light_stem(token: str) -> str:
    """SwedishLightStemmer.stem (sv/SwedishLightStemmer.java:52)."""
    s = token
    n = len(s)
    if n > 4 and s[-1] == "s":
        s = s[: n - 1]
        n -= 1
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[: n - 5]
    if n > 6 and s.endswith(
        ("arne", "erna", "ande", "else", "aste", "orna", "aren")
    ):
        return s[: n - 4]
    if n > 5 and s.endswith(("are", "ast", "het")):
        return s[: n - 3]
    if n > 4 and s.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return s[: n - 2]
    if n > 3 and s[-1] in "taen":
        return s[: n - 1]
    return s


# ----------------------------------------------------------- German minimal

_DEMIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(token: str) -> str:
    """GermanMinimalStemmer.stem (de/GermanMinimalStemmer.java:55) —
    note the Java switch FALLTHROUGH structure: a 2-char match returns,
    a 1-char mismatch BREAKS OUT of the switch entirely (no later cases
    are tried), then the final single-char strip still applies."""
    if len(token) < 5:
        return token
    s = token.translate(_DEMIN_FOLD)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[: n - 3]
    if n > 5:
        last = s[-1]
        if last == "n":
            if s[n - 2] == "e":
                return s[: n - 2]
        elif last == "e":
            if s[n - 2] == "s":
                return s[: n - 2]
        elif last == "s":
            if s[n - 2] == "e":
                return s[: n - 2]
        elif last == "r":
            if s[n - 2] == "e":
                return s[: n - 2]
    if s[-1] in "nesr":
        return s[: len(s) - 1]
    return s


# ----------------------------------------------------------- French minimal


def french_minimal_stem(token: str) -> str:
    """FrenchMinimalStemmer.stem (fr/FrenchMinimalStemmer.java:55)."""
    if len(token) < 6:
        return token
    s = list(token)
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s[-2] = "l"
        return "".join(s[:-1])
    if s[-1] == "s":
        s.pop()
    if s[-1] == "r":
        s.pop()
    if s[-1] == "e":
        s.pop()
    if s[-1] == "é":
        s.pop()
    if s[-1] == s[-2] and s[-1].isalpha():
        s.pop()
    return "".join(s)


# ----------------------------------------------------------- Spanish plural

_ES_PLURAL_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")
_ES_VOWELS = set("aeiou")

# SpanishPluralStemmer.java invariantsList (verbatim word data)
_ES_INVARIANTS = frozenset("""
abrebotellas abrecartas abrelatas afueras albatros albricias aledaños
alexis alicates analisis andurriales antitesis añicos apendicitis
apocalipsis arcoiris aries bilis boletus boris brindis cactus canutas
caries cascanueces cascarrabias ciempies cifosis cortaplumas corpus
cosmos cosquillas creces crisis cuatrocientas cuatrocientos cuelgacapas
cuentacuentos cuentapasos cumpleaños doscientas doscientos dosis enseres
entonces esponsales estatus exequias fauces forceps fotosintesis gafas
gafotas gargaras gris honorarios ictus jueves lapsus lavacoches
lavaplatos limpiabotas lunes maitines martes mondadientes novecientas
novecientos nupcias ochocientas ochocientos pais paris parabrisas
paracaidas parachoques paraguas pararrayos pisapapeles piscis
portaaviones portamaletas portamantas quinientas quinientos quitamanchas
recogepelotas rictus rompeolas sacacorchos sacapuntas saltamontes
salvavidas seis seiscientas seiscientos setecientas setecientos sintesis
tenis tifus trabalenguas vacaciones venus versus viacrucis virus viveres
volandas
""".split())

_ES_SPECIAL = frozenset(
    ("yoes", "noes", "sies", "clubes", "faralaes", "albalaes", "itemes",
     "albumes", "sandwiches", "relojes", "bojes", "contrarreloj", "carcajes")
)


def spanish_plural_stem(token: str) -> str:
    """SpanishPluralStemmer.stem (es/SpanishPluralStemmer.java:165)."""
    if len(token) < 4:
        return token
    s = token.translate(_ES_PLURAL_FOLD)
    if s in _ES_INVARIANTS:
        return s
    if s in _ES_SPECIAL:
        return s[:-2]
    n = len(s)
    if s[-1] != "s":
        return s
    if s[n - 2] not in _ES_VOWELS:
        return s[: n - 1]
    if s[n - 4] == "q" or (
        s[n - 4] == "g" and s[n - 3] == "u" and s[n - 2] in "ie"
    ):
        # NOTE: the reference's condition is literally
        # (q || (g && u && (i|e))) due to Java && precedence — a 'q' at
        # len-4 short-circuits regardless of the following letters
        return s[: n - 1]
    if s[n - 4] in _ES_VOWELS and s[n - 3] == "r" and s[n - 2] == "e":
        return s[: n - 2]
    if s[n - 4] in _ES_VOWELS and s[n - 3] in "dlnx" and s[n - 2] == "e":
        return s[: n - 2]
    if s[n - 3] in "yu" and s[n - 2] == "e":
        return s[: n - 2]
    if (
        s[n - 4] in "ulrtn" and s[n - 3] == "i" and s[n - 2] == "e"
    ):
        return s[: n - 2]
    if s[n - 3] == "s" and s[n - 2] == "e":
        return s[: n - 2]
    if s[n - 3] in _ES_VOWELS and s[n - 2] == "i":
        return s[: n - 2] + "y"
    if s[n - 3] == "d" and s[n - 2] == "i":
        return s[: n - 2] + "y"
    if s[n - 3] == "c" and s[n - 2] == "e":
        return s[: n - 3] + "z"
    if s[n - 2] in _ES_VOWELS:
        return s[: n - 1]
    return s


# ------------------------------------------------------------------- Sorani

_SORANI_MAP = {
    "ي": "ی",  # YEH -> FARSI_YEH
    "ى": "ی",  # DOTLESS_YEH -> FARSI_YEH
    "ك": "ک",  # KAF -> KEHEH
    "ة": "ە",  # TEH_MARBUTA -> AE
    "ھ": "ه",  # HEH_DOACHASHMEE -> HEH
    "ڒ": "ڕ",  # RREH_ABOVE -> RREH
}
_SORANI_DELETE = set(
    "ـًٌٍَُِّْ"
)  # tatweel + harakat
_HEH, _AE, _ZWNJ, _REH, _RREH = (
    "ه", "ە", "‌", "ر", "ڕ",
)


def sorani_normalize(token: str) -> str:
    """SoraniNormalizer.normalize (ckb/SoraniNormalizer.java:55-128):
    yeh/kaf unification, ZWNJ handling (heh+ZWNJ -> ae), final heh -> ae,
    initial reh -> rreh, tatweel/harakat and other FORMAT chars deleted."""
    import unicodedata

    s = list(token)
    i = 0
    while i < len(s):
        c = s[i]
        if c in _SORANI_MAP:
            s[i] = _SORANI_MAP[c]
        elif c == _ZWNJ:
            if i > 0 and s[i - 1] == _HEH:
                s[i - 1] = _AE
            del s[i]
            continue
        elif c == _HEH:
            if i == len(s) - 1:
                s[i] = _AE
        elif c == _REH:
            if i == 0:
                s[i] = _RREH
        elif c in _SORANI_DELETE:
            del s[i]
            continue
        elif unicodedata.category(c) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(token: str) -> str:
    """SoraniStemmer.stem (ckb/SoraniStemmer.java:27-95) — applied AFTER
    sorani_normalize in the analyzer chain, as the reference does."""
    s = token
    n = len(s)
    # postposition
    if n > 5 and s.endswith("دا"):          # دا
        s = s[:-2]
    elif n > 4 and s.endswith("نا"):        # نا
        s = s[:-1]
    elif n > 6 and s.endswith("ەوە"):  # ەوە
        s = s[:-3]
    n = len(s)
    # possessive pronoun
    if n > 6 and s.endswith(("مان", "یان",
                             "تان")):  # مان یان تان
        s = s[:-3]
    n = len(s)
    if n > 6 and s.endswith("ێکی"):            # ێکی
        return s[:-3]
    if n > 7 and s.endswith("یەکی"):      # یەکی
        return s[:-4]
    if n > 5 and s.endswith("ێک"):                  # ێک
        return s[:-2]
    if n > 6 and s.endswith("یەک"):            # یەک
        return s[:-3]
    if n > 6 and s.endswith("ەکە"):            # ەکە
        return s[:-3]
    if n > 5 and s.endswith("کە"):                  # کە
        return s[:-2]
    if n > 7 and s.endswith("ەکان"):      # ەکان
        return s[:-4]
    if n > 6 and s.endswith("کان"):            # کان
        return s[:-3]
    if n > 7 and s.endswith("یانی"):      # یانی
        return s[:-4]
    if n > 6 and s.endswith("انی"):            # انی
        return s[:-3]
    if n > 6 and s.endswith("یان"):            # یان
        return s[:-3]
    if n > 5 and s.endswith("ان"):                  # ان
        return s[:-2]
    if n > 7 and s.endswith("یانە"):      # یانە
        return s[:-4]
    if n > 6 and s.endswith("انە"):            # انە
        return s[:-3]
    if n > 5 and s.endswith(("ایە", "ەیە")):  # ایە ەیە
        return s[:-2]
    if n > 4 and s.endswith("ە"):                        # ە
        return s[:-1]
    if n > 4 and s.endswith("ی"):                        # ی
        return s[:-1]
    return s


def sorani_normalize_and_stem(token: str) -> str:
    return sorani_stem(sorani_normalize(token))


# ---------------------------------------------------------------- Norwegian

NO_BOKMAAL = 1  # NorwegianLightStemmer.BOKMAAL
NO_NYNORSK = 2  # NorwegianLightStemmer.NYNORSK


def norwegian_light_stem(token: str, flags: int = NO_BOKMAAL) -> str:
    """NorwegianLightStemmer.stem (no/NorwegianLightStemmer.java:60-150;
    flags select the Bokmål / Nynorsk ending sets)."""
    if flags <= 0 or flags > NO_BOKMAAL + NO_NYNORSK:
        raise ValueError("invalid flags")
    bm = bool(flags & NO_BOKMAAL)
    nn = bool(flags & NO_NYNORSK)
    s = token
    n = len(s)
    if n > 4 and s[-1] == "s":
        s = s[: n - 1]
        n -= 1
    if n > 7 and (
        (s.endswith(("heter", "heten")) and bm)
        or (s.endswith("heita") and nn)
    ):
        return s[: n - 5]
    if n > 8 and nn and s.endswith(("heiter", "leiken", "leikar")):
        return s[: n - 6]
    if n > 5 and (s.endswith("dom") or (s.endswith("het") and bm)):
        return s[: n - 3]
    if n > 6 and nn and s.endswith(("heit", "semd", "leik")):
        return s[: n - 4]
    if n > 7 and s.endswith(("elser", "elsen")):
        return s[: n - 5]
    if n > 6 and (
        (s.endswith("ende") and bm)
        or (s.endswith("ande") and nn)
        or s.endswith("else")
        or (s.endswith("este") and bm)
        or (s.endswith("aste") and nn)
        or (s.endswith("eren") and bm)
        or (s.endswith("aren") and nn)
    ):
        return s[: n - 4]
    if n > 5 and (
        (s.endswith("ere") and bm)
        or (s.endswith("are") and nn)
        or (s.endswith("est") and bm)
        or (s.endswith("ast") and nn)
        or s.endswith("ene")
        or (s.endswith("ane") and nn)
    ):
        return s[: n - 3]
    if n > 4 and (
        s.endswith(("er", "en", "et", "te"))
        or (s.endswith("ar") and nn)
        or (s.endswith("st") and bm)
    ):
        return s[: n - 2]
    if n > 3 and s[-1] in "aen":
        return s[: n - 1]
    return s


def norwegian_minimal_stem(token: str, flags: int = NO_BOKMAAL) -> str:
    """NorwegianMinimalStemmer.stem (no/NorwegianMinimalStemmer.java)."""
    if flags <= 0 or flags > NO_BOKMAAL + NO_NYNORSK:
        raise ValueError("invalid flags")
    nn = bool(flags & NO_NYNORSK)
    s = token
    n = len(s)
    if n > 4 and s[-1] == "s":
        s = s[: n - 1]
        n -= 1
    if n > 5 and (s.endswith("ene") or (s.endswith("ane") and nn)):
        return s[: n - 3]
    if n > 4 and (
        s.endswith(("er", "en", "et")) or (s.endswith("ar") and nn)
    ):
        return s[: n - 2]
    if n > 3 and s[-1] in "ae":
        return s[: n - 1]
    return s


# ------------------------------------------------------------------ English

def english_minimal_stem(token: str) -> str:
    """EnglishMinimalStemmer.stem — Harman's S-Stemmer
    (en/EnglishMinimalStemmer.java:24-44): strips plural -s with the
    us/ss/ies exceptions; "ies" -> "y" unless preceded by a/e."""
    s = token
    n = len(s)
    if n < 3 or s[-1] != "s":
        return s
    c = s[-2]
    if c in "us":
        return s
    if c == "e":
        if n > 3 and s[n - 3] == "i" and s[n - 4] not in "ae":
            return s[: n - 3] + "y"
        if s[n - 3] in "iaoe":
            return s
    return s[: n - 1]


def english_possessive(token: str) -> str:
    """EnglishPossessiveFilter (en/EnglishPossessiveFilter.java:40-48):
    strip trailing 's (apostrophe U+0027/U+2019/U+FF07, s or S)."""
    if (
        len(token) >= 2
        and token[-2] in "'’＇"
        and token[-1] in "sS"
    ):
        return token[:-2]
    return token


# ------------------------------------------------------------------ Swedish

def swedish_minimal_stem(token: str) -> str:
    """SwedishMinimalStemmer.stem (sv/SwedishMinimalStemmer.java:62-85):
    common noun plural suffixes only."""
    s = token
    n = len(s)
    if n > 4 and s[-1] == "s":
        s = s[: n - 1]
        n -= 1
    if n > 6 and s.endswith(("arne", "erna", "arna", "orna", "aren")):
        return s[: n - 4]
    if n > 5 and s.endswith("are"):
        return s[: n - 3]
    if n > 4 and s.endswith(("ar", "at", "er", "et", "or", "en")):
        return s[: n - 2]
    if n > 3 and s[-1] in "aen":
        return s[: n - 1]
    return s
