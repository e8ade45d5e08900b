"""Indic-script analysis — IndicNormalizer, Hindi and Bengali
normalizers/stemmers, re-expressed in Python from the reference sources
as spec:

  in/IndicNormalizer.java:60-290   indic_normalize (9-script vowel/matra
                                   composition table; the decomposition
                                   rows below are that table verbatim —
                                   embedded DATA, same stance as
                                   analysis/stoplists.py)
  hi/HindiNormalizer.java:40-160   hindi_normalize
  hi/HindiStemmer.java:25-115      hindi_stem (suffix cascade as data)
  bn/BengaliNormalizer.java:30-135 bengali_normalize
  bn/BengaliStemmer.java:25-135    bengali_stem

Golden tests parse the reference's own Test*.java vectors at test time
(tests/test_indic.py) — no SQL oracle (DuckDB has no Indic analysis).
All functions operate per-UNIQUE-term via lightstem.light_stem_terms.
"""

from __future__ import annotations

__all__ = [
    "indic_normalize",
    "decimal_digit_fold",
    "hindi_normalize",
    "hindi_stem",
    "hindi_normalize_chain",
    "bengali_normalize",
    "bengali_stem",
    "bengali_normalize_chain",
]

# 9 Indic script blocks, each 128 code points wide (flag, base):
# Character.UnicodeBlock dispatch in IndicNormalizer.normalize reduces to
# base = cp & ~0x7F within 0x0900-0x0D7F.
_SCRIPT_FLAGS = {
    0x0900: 1,    # Devanagari
    0x0980: 2,    # Bengali
    0x0A00: 4,    # Gurmukhi
    0x0A80: 8,    # Gujarati
    0x0B00: 16,   # Oriya
    0x0B80: 32,   # Tamil
    0x0C00: 64,   # Telugu
    0x0C80: 128,  # Kannada
    0x0D00: 256,  # Malayalam
}

# (ch1, ch2, ch3, result, script-flag mask) — offsets into the script
# block; ch3 == -1 means a 2-char rule; 0xFF in ch3 position matches ZWJ.
_DECOMP = (
    (0x5, 0x3e, 0x45, 0x11, 0x9),
    (0x5, 0x3e, 0x46, 0x12, 0x1),
    (0x5, 0x3e, 0x47, 0x13, 0x9),
    (0x5, 0x3e, 0x48, 0x14, 0x9),
    (0x5, 0x3e, -0x1, 0x6, 0x1f),
    (0x5, 0x45, -0x1, 0x72, 0x1),
    (0x5, 0x45, -0x1, 0xd, 0x8),
    (0x5, 0x46, -0x1, 0x4, 0x1),
    (0x5, 0x47, -0x1, 0xf, 0x8),
    (0x5, 0x48, -0x1, 0x10, 0xc),
    (0x5, 0x49, -0x1, 0x11, 0x9),
    (0x5, 0x4a, -0x1, 0x12, 0x1),
    (0x5, 0x4b, -0x1, 0x13, 0x9),
    (0x5, 0x4c, -0x1, 0x14, 0xd),
    (0x6, 0x45, -0x1, 0x11, 0x9),
    (0x6, 0x46, -0x1, 0x12, 0x1),
    (0x6, 0x47, -0x1, 0x13, 0x9),
    (0x6, 0x48, -0x1, 0x14, 0x9),
    (0x7, 0x57, -0x1, 0x8, 0x100),
    (0x9, 0x41, -0x1, 0xa, 0x1),
    (0x9, 0x57, -0x1, 0xa, 0x120),
    (0xe, 0x46, -0x1, 0x10, 0x100),
    (0xf, 0x45, -0x1, 0xd, 0x1),
    (0xf, 0x46, -0x1, 0xe, 0x1),
    (0xf, 0x47, -0x1, 0x10, 0x1),
    (0xf, 0x57, -0x1, 0x10, 0x10),
    (0x12, 0x3e, -0x1, 0x13, 0x100),
    (0x12, 0x4c, -0x1, 0x14, 0xc0),
    (0x12, 0x55, -0x1, 0x13, 0x40),
    (0x12, 0x57, -0x1, 0x14, 0x120),
    (0x13, 0x57, -0x1, 0x14, 0x10),
    (0x15, 0x3c, -0x1, 0x58, 0x1),
    (0x16, 0x3c, -0x1, 0x59, 0x5),
    (0x17, 0x3c, -0x1, 0x5a, 0x5),
    (0x1c, 0x3c, -0x1, 0x5b, 0x5),
    (0x21, 0x3c, -0x1, 0x5c, 0x13),
    (0x22, 0x3c, -0x1, 0x5d, 0x13),
    (0x23, 0x4d, 0xff, 0x7a, 0x100),
    (0x24, 0x4d, 0xff, 0x4e, 0x2),
    (0x28, 0x3c, -0x1, 0x29, 0x1),
    (0x28, 0x4d, 0xff, 0x7b, 0x100),
    (0x2b, 0x3c, -0x1, 0x5e, 0x5),
    (0x2f, 0x3c, -0x1, 0x5f, 0x3),
    (0x2c, 0x41, 0x41, 0xb, 0x40),
    (0x30, 0x3c, -0x1, 0x31, 0x1),
    (0x30, 0x4d, 0xff, 0x7c, 0x100),
    (0x32, 0x4d, 0xff, 0x7d, 0x100),
    (0x33, 0x3c, -0x1, 0x34, 0x1),
    (0x33, 0x4d, 0xff, 0x7e, 0x100),
    (0x35, 0x41, -0x1, 0x2e, 0x40),
    (0x3e, 0x45, -0x1, 0x49, 0x9),
    (0x3e, 0x46, -0x1, 0x4a, 0x1),
    (0x3e, 0x47, -0x1, 0x4b, 0x9),
    (0x3e, 0x48, -0x1, 0x4c, 0x9),
    (0x3f, 0x55, -0x1, 0x40, 0x80),
    (0x41, 0x41, -0x1, 0x42, 0x4),
    (0x46, 0x3e, -0x1, 0x4a, 0x120),
    (0x46, 0x42, 0x55, 0x4b, 0x80),
    (0x46, 0x42, -0x1, 0x4a, 0x80),
    (0x46, 0x46, -0x1, 0x48, 0x100),
    (0x46, 0x55, -0x1, 0x47, 0xc0),
    (0x46, 0x56, -0x1, 0x48, 0xc0),
    (0x46, 0x57, -0x1, 0x4c, 0x120),
    (0x47, 0x3e, -0x1, 0x4b, 0x132),
    (0x47, 0x57, -0x1, 0x4c, 0x12),
    (0x4a, 0x55, -0x1, 0x4b, 0x80),
    (0x72, 0x3f, -0x1, 0x7, 0x4),
    (0x72, 0x40, -0x1, 0x8, 0x4),
    (0x72, 0x47, -0x1, 0xf, 0x4),
    (0x73, 0x41, -0x1, 0x9, 0x4),
    (0x73, 0x42, -0x1, 0xa, 0x4),
    (0x73, 0x4b, -0x1, 0x13, 0x4),
)


def indic_normalize(token: str) -> str:
    """IndicNormalizer.normalize: compose split vowels/matras into their
    canonical form per script (table above)."""
    s = list(token)
    i = 0
    while i < len(s):
        cp = ord(s[i])
        base = cp & ~0x7F
        flag = _SCRIPT_FLAGS.get(base)
        if flag is not None:
            ch0 = cp - base
            hit = _compose(s, i, base, ch0, flag)
            if hit:
                i += 1
                continue
        i += 1
    return "".join(s)


def _compose(s: list, pos: int, base: int, ch0: int, flag: int) -> bool:
    if pos + 1 >= len(s):
        return False
    cp1 = ord(s[pos + 1])
    if cp1 & ~0x7F != base:
        return False
    ch1 = cp1 - base
    ch2 = -1
    if pos + 2 < len(s):
        cp2 = ord(s[pos + 2])
        if cp2 == 0x200D:  # ZWJ
            ch2 = 0xFF
        elif cp2 & ~0x7F == base:
            ch2 = cp2 - base
    for a, b, c, res, flags in _DECOMP:
        if a == ch0 and (flags & flag):
            if b == ch1 and (c < 0 or c == ch2):
                s[pos] = chr(base + res)
                del s[pos + 1]
                if c >= 0:
                    del s[pos + 1]
                return True
    return False


# ------------------------------------------------------------------------
# core/DecimalDigitFilter.java:45-60 — fold any non-Latin decimal digit to
# its ASCII equivalent (Character.isDigit == category Nd; unicodedata.digit
# is defined exactly for those).

def decimal_digit_fold(token: str) -> str:
    import unicodedata

    out = []
    for ch in token:
        if ord(ch) > 0x7F:
            d = unicodedata.digit(ch, None)
            if d is not None:
                out.append(chr(0x30 + d))
                continue
        out.append(ch)
    return "".join(out)


# ------------------------------------------------------------------------
# hi/HindiNormalizer.java — nukta/ZWJ/ZWNJ/virama removal + the 1:1
# orthographic folds of the switch table.

_HI_DELETE = frozenset("़‍‌्")
_HI_MAP = {
    "ँ": "ं", "ऩ": "न", "ऱ": "र",
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े", "ॉ": "ो",
    "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ", "ी": "ि", "ू": "ु",
    "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
    "ौ": "ो",
}


def hindi_normalize(token: str) -> str:
    s = list(token)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "न":  # na + virama -> anusvara
            if i + 1 < len(s) and s[i + 1] == "्":
                s[i] = "ं"
                del s[i + 1]
        elif c in _HI_DELETE:
            del s[i]
            i -= 1
        else:
            r = _HI_MAP.get(c)
            if r is not None:
                s[i] = r
        i += 1
    return "".join(s)


# ------------------------------------------------------------------------
# hi/HindiStemmer.java — (min-length guard, chars cut, suffixes) cascade,
# first matching group wins. Table machine-extracted from the reference
# source (embedded DATA).

_HI_SUFFIXES = (
    (6, 5, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (5, 4, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ", "ियों", "ियां")),
    (4, 3, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं")),
    (3, 2, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती", "ता", "ाँ", "ां", "ों", "ें")),
    (2, 1, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)  # 67 suffixes


def hindi_stem(token: str) -> str:
    n = len(token)
    for guard, cut, sfxs in _HI_SUFFIXES:
        if n > guard and token.endswith(sfxs):
            return token[: n - cut]
    return token


# ------------------------------------------------------------------------
# bn/BengaliNormalizer.java — chandrabindu/visarga handling, assimilation
# of ya-phala/ba-phala, and the 1:1 folds; the index gymnastics below are
# the reference switch verbatim (i adjustments mirror its delete(...)+i--).


def bengali_normalize(token: str) -> str:
    s = list(token)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":  # chandrabindu: delete
            del s[i]
            i -= 1
        elif c == "ী":  # long ii -> i
            s[i] = "ি"
        elif c == "ূ":  # long uu -> u
            s[i] = "ু"
        elif c == "ক":  # ka + virama + i-matra -> kha
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif c == "ঙ":  # nga -> anusvara
            s[i] = "ং"
        elif c == "য":  # ya-phala assimilation
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                i -= 1
            elif i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 2
        elif c == "ব":  # ba-phala assimilation
            if (i >= 1 and s[i - 1] != "্") or i == 0:
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                i -= 1
        elif c == "ঃ":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
            else:
                s[i] = s[i + 1]
        elif c in ("শ", "ষ"):  # sha/ssa -> sa
            s[i] = "স"
        elif c == "ণ":  # nna -> na
            s[i] = "ন"
        elif c in ("ড়", "ঢ়"):  # rra/rha -> ra
            s[i] = "র"
        elif c == "ৎ":  # khanda-ta -> ta
            s[i] = "ত"
        i += 1
    return "".join(s)


# ------------------------------------------------------------------------
# bn/BengaliStemmer.java — same cascade shape as Hindi (the len>9 group
# cuts 8 of its 8-char suffixes). Machine-extracted table (embedded DATA).

_BN_SUFFIXES = (
    (9, 8, ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন", "ইয়াছিলেন")),
    (8, 7, ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি", "য়েদেরকে")),
    (7, 6, ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন", "েদেরকে")),
    (6, 5, ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")),
    (5, 4, ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের")),
    (4, 3, ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের")),
    (3, 2, ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা", "কে")),
    (2, 1, ("ি", "ী", "া", "ো", "ে", "ব", "ত")),
)  # 105 suffixes


def bengali_stem(token: str) -> str:
    n = len(token)
    for guard, cut, sfxs in _BN_SUFFIXES:
        if n > guard and token.endswith(sfxs):
            return token[: n - cut]
    return token


def hindi_normalize_chain(token: str) -> str:
    """hi/HindiAnalyzer.java:122-129 pre-stop chain: DecimalDigitFilter ->
    IndicNormalizationFilter -> HindiNormalizationFilter (lowercase is the
    tokenizer's)."""
    return hindi_normalize(indic_normalize(decimal_digit_fold(token)))


def bengali_normalize_chain(token: str) -> str:
    """bn/BengaliAnalyzer.java:120-128 pre-stop chain."""
    return bengali_normalize(indic_normalize(decimal_digit_fold(token)))
